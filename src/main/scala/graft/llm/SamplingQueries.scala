package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{NamedQuery, Tables, VocabGuard}
import graft.ops.Registry.rnd
import graft.ops.Tables.table

/** Corpus-selection signals that need a sampling or information-theory
  * twist the rest of the suite lacks:
  *
  *  - [[sampleWeighted]] — deterministic weighted sampling without
  *    replacement (per-language bottom-k by hash-derived priority).
  *  - [[unigramEntropy]] — per-document token-distribution entropy, the
  *    curation gate that separates repetitive/boilerplate docs from
  *    genuinely diverse text (Gopher's frac gates catch the extreme
  *    cases; entropy ranks the middle).
  */
object SamplingQueries {

  def queries: Vector[NamedQuery] = Vector(
    NamedQuery("sample_weighted", sampleWeighted, Some(sampleWeightedSql)),
    NamedQuery("text_entropy", unigramEntropy, Some(unigramEntropySql)),
    NamedQuery("text_cross_entropy", crossEntropy, Some(crossEntropySql)),
    NamedQuery("text_tfidf_keyword", tfidfKeyword, Some(tfidfKeywordSql)),
    NamedQuery("text_kl_by_source", klBySource, Some(klBySourceSql)),
    NamedQuery("text_perplexity_bucket", perplexityBucket, Some(perplexityBucketSql)),
    NamedQuery("eval_bradley_terry_step", bradleyTerryStep, Some(bradleyTerryStepSql)),
  )

  // ---------------------------------------------------------------
  // Preference-strength aggregation — the RLHF / LLM-judge data shape:
  // pairwise comparisons between items (here: sources, judged through
  // their documents) reduced to per-item strengths via the
  // Bradley-Terry model, advanced by the standard MM update
  //   w_i' = W_i / Σ_j n_ij / (w_i + w_j)
  // (Hunter 2004). Comparisons are derived deterministically: within
  // each language, consecutive documents by doc_id form a pair and the
  // longer document's source wins (doc_id breaks ties) — a stand-in
  // for a judge verdict column; swap any (a, b, winner) table in and
  // the dataflow below is unchanged. TWO steps are emitted: from the
  // uniform init the first step is exactly 2·wins/games, and the
  // second step exercises the real fixed-point dataflow (pair-count
  // table joined against the previous strength vector).
  //
  // Scale shape: ONE window pass over the corpus (partitioned by
  // lang) produces the match stream; everything downstream lives on
  // |sources|- and |sources|²-row tables (games/wins aggregation,
  // directed pair counts, two broadcast joins against the strength
  // vector). At 100 TB the corpus pass dominates and is embarrassingly
  // parallel; the MM iteration never touches the corpus again.
  //
  // Determinism: wins/games/n_ij are integers; w1 quantizes to 6 dp
  // (clamped away from zero so the step-2 denominators stay finite),
  // each step-2 term snaps to DECIMAL(18,8) before an exact decimal
  // sum, and the final division rounds to 6 dp — no libm surface at
  // all, so the oracle twin is bit-exact.
  private def bradleyTerryStep(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    val matches = table(spark, dir, "documents")
      .select(col("lang"), col("doc_id"), col("source"), col("n_chars"))
      .withColumn("src_b", lead(col("source"), 1).over(w))
      .withColumn("cb", lead(col("n_chars"), 1).over(w))
      .filter(col("src_b").isNotNull && col("source") =!= col("src_b"))
      .select(col("source").as("src_a"), col("src_b"),
        when(col("n_chars") >= col("cb"), col("source")).otherwise(col("src_b"))
          .as("winner"))
      // one match row per document; consumed 4× below (both sided
      // unions, both pair directions) — pin the lead-window output once
      // instead of re-sorting the corpus per consumer (guide §5)
      .localCheckpoint()
    val sided = matches.select(col("src_a").as("src"), col("winner"))
      .unionAll(matches.select(col("src_b").as("src"), col("winner")))
    val g = sided.groupBy(col("src"))
      .agg(count(lit(1)).as("games"),
        sum(when(col("src") === col("winner"), 1L).otherwise(0L)).as("wins"))
      .withColumn("w1",
        greatest(rnd(lit(2.0) * col("wins") / col("games"), 6), lit(0.000001)))
    val pairs = matches.select(col("src_a").as("i"), col("src_b").as("j"))
      .unionAll(matches.select(col("src_b").as("i"), col("src_a").as("j")))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("n"))
    val wi = g.select(col("src").as("i"), col("w1").as("wi"))
    val wj = g.select(col("src").as("j"), col("w1").as("wj"))
    val den = pairs
      .join(broadcast(wi), "i").join(broadcast(wj), "j")
      .groupBy(col("i"))
      .agg(sum(round((col("n") / (col("wi") + col("wj"))).cast("decimal(18,8)"), 8))
        .cast("double").as("denom"))
    g.join(broadcast(den), g("src") === den("i"))
      .select(col("src").as("source"), col("games"), col("wins"), col("w1"),
        rnd(col("wins") / col("denom"), 6).as("w2"))
      .orderBy(col("source"))
  }

  private val bradleyTerryStepSql =
    """WITH p AS (
      |  SELECT lang, source AS src_a, n_chars AS ca,
      |    lead(source) OVER w AS src_b, lead(n_chars) OVER w AS cb
      |  FROM documents WINDOW w AS (PARTITION BY lang ORDER BY doc_id)
      |), m AS (
      |  SELECT src_a, src_b,
      |    CASE WHEN ca >= cb THEN src_a ELSE src_b END AS winner
      |  FROM p WHERE src_b IS NOT NULL AND src_a <> src_b
      |), g AS (
      |  SELECT src, CAST(count(*) AS BIGINT) AS games,
      |    CAST(sum(CASE WHEN src = winner THEN 1 ELSE 0 END) AS BIGINT) AS wins
      |  FROM (SELECT src_a AS src, winner FROM m
      |        UNION ALL SELECT src_b AS src, winner FROM m)
      |  GROUP BY src
      |), w1t AS (
      |  SELECT src, games, wins,
      |    greatest(CAST(round(CAST(2.0 * wins / games AS DECIMAL(18,8)), 6) AS DOUBLE),
      |             0.000001) AS w1
      |  FROM g
      |), pairs AS (
      |  SELECT i, j, CAST(count(*) AS BIGINT) AS n
      |  FROM (SELECT src_a AS i, src_b AS j FROM m
      |        UNION ALL SELECT src_b AS i, src_a AS j FROM m)
      |  GROUP BY i, j
      |), den AS (
      |  SELECT p.i AS src,
      |    CAST(sum(round(CAST(p.n / (wi.w1 + wj.w1) AS DECIMAL(18,8)), 8)) AS DOUBLE) AS denom
      |  FROM pairs p JOIN w1t wi ON wi.src = p.i JOIN w1t wj ON wj.src = p.j
      |  GROUP BY p.i
      |)
      |SELECT w1t.src AS source, games, wins, w1,
      |  CAST(round(CAST(wins / denom AS DECIMAL(18,8)), 6) AS DOUBLE) AS w2
      |FROM w1t JOIN den ON den.src = w1t.src
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------
  // CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
  // document by its cross-entropy under a language model trained on a
  // CURATED SEED slice (here the same src0-src4 seed convention the LR
  // quality model uses), then split each language into head/middle/tail
  // tertiles — head = closest to the seed distribution, tail = furthest.
  // The seed LM is add-one-smoothed unigram over the corpus vocabulary,
  // so out-of-seed words get a finite penalty instead of -inf.
  //
  // Scale shape: one corpus word explode feeding (a) the vocabulary
  // count and (b) the seed frequency table — both vocabulary-bounded
  // (Heaps' law), so both BROADCAST; the per-doc score is one shuffle
  // on doc_id. The tertile split is a per-language ntile window over
  // DOC-level rows (not tokens); at 100 TB the exact window would sort
  // billions of rows per language, so the scale path replaces it with
  // approx_percentile cutpoints (two numbers per language, broadcast)
  // joined back as a projection — same outputs up to boundary ties,
  // zero extra shuffle. The exact ntile here is the oracle-checkable
  // form of the same contract.
  //
  // Determinism: per-word -ln p quantizes to 6 dp through
  // DECIMAL(18,8) per row, exact decimal sum, ONE double division
  // (the qualityLrStep mean6 discipline — summation order can never
  // move the score); tertile ordering is total via (ce_seed, doc_id).
  private val ppSeedSources = Seq("src0", "src1", "src2", "src3", "src4")

  private def perplexityBucket(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.fanOut(table(spark, dir, "documents"))
      .select(col("doc_id"), col("lang"), col("source"),
        explode(split(col("text"), " ")).as("word"))
    // ONE vocabulary-bounded aggregation serves all three model terms:
    // per-word seed counts (c_seed = 0 for out-of-seed words, so the
    // scoring join is a plain inner join — every corpus word is here),
    // the vocabulary size |V|, and the seed token total. localCheckpoint
    // pins it so the tiny |V|/N_seed rollups don't re-run the corpus
    // explode (the klBySource shared-subplan note): two corpus passes
    // total — the model build and the scoring join — not four.
    val wc = words
      .groupBy(col("word"))
      .agg(sum(when(col("source").isin(ppSeedSources: _*), 1L).otherwise(0L))
        .as("c_seed"))
      .localCheckpoint()
    val v = wc.agg(count(lit(1)).cast("double").as("v"))
    val seedTotal = wc.agg(sum(col("c_seed")).cast("double").as("n_seed"))
    val nll = -log((col("c_seed") + lit(1.0)) / (col("n_seed") + col("v")))
    // wc is WORD-keyed — vocabulary-sized, not bounded (VERDICT r16 #1):
    // broadcast only under the guarded NDV cap; the 1-row totals stay
    // hard-hinted (genuinely bounded).
    val scored = words
      .join(VocabGuard.maybeBroadcast(spark, dir, wc), Seq("word"))
      .crossJoin(broadcast(seedTotal)).crossJoin(broadcast(v))
      .groupBy(col("lang"), col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        rnd(sum(round(nll.cast("decimal(18,8)"), 6)).cast("double") / count(lit(1)), 6)
          .as("ce_seed"))
    val w = Window.partitionBy(col("lang")).orderBy(col("ce_seed"), col("doc_id"))
    scored.withColumn("t", ntile(3).over(w))
      .withColumn("bucket",
        when(col("t") === 1, "head").when(col("t") === 2, "middle").otherwise("tail"))
      .select(col("lang"), col("doc_id"), col("n_words"), col("ce_seed"), col("bucket"))
      .orderBy(col("lang"), col("doc_id"))
  }

  private val perplexityBucketSql = {
    val seeds = ppSeedSources.map(s => s"'$s'").mkString(", ")
    s"""WITH w AS (
      |  SELECT doc_id, lang, source, unnest(string_split(text, ' ')) AS word
      |  FROM documents
      |), v AS (
      |  SELECT CAST(count(DISTINCT word) AS DOUBLE) AS v FROM w
      |), sc AS (
      |  SELECT word, count(*) AS c_seed FROM w
      |  WHERE source IN ($seeds) GROUP BY word
      |), nt AS (
      |  SELECT CAST(sum(c_seed) AS DOUBLE) AS n_seed FROM sc
      |), scored AS (
      |  SELECT w.lang, w.doc_id, CAST(count(*) AS BIGINT) AS n_words,
      |    CAST(round(CAST(CAST(sum(round(CAST(
      |      -ln((COALESCE(sc.c_seed, 0) + 1.0) / (nt.n_seed + v.v))
      |    AS DECIMAL(18,8)), 6)) AS DOUBLE) / count(*) AS DECIMAL(18,8)), 6) AS DOUBLE) AS ce_seed
      |  FROM w LEFT JOIN sc USING (word), nt, v
      |  GROUP BY w.lang, w.doc_id
      |)
      |SELECT lang, doc_id, n_words, ce_seed,
      |  CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
      |FROM (
      |  SELECT *, ntile(3) OVER (PARTITION BY lang ORDER BY ce_seed, doc_id) AS t
      |  FROM scored
      |)
      |ORDER BY lang, doc_id""".stripMargin
  }

  // ---------------------------------------------------------------
  // Per-source distribution drift: KL(source ‖ corpus) over the word
  // distributions — the monitoring signal that flags a crawl source
  // whose content shifted (spam injection, template change, language
  // drift) relative to the corpus at large. Shape: one (source, word)
  // aggregation (the only corpus-sized shuffle), then everything else
  // is vocabulary-bounded — per-source totals and the corpus frequency
  // table both broadcast, and the final per-source reduce is one tiny
  // exchange. Since every source's words are a subset of the corpus,
  // q(w) > 0 always and KL is finite by construction.
  private def klBySource(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.fanOut(table(spark, dir, "documents"))
      .select(col("source"), explode(split(col("text"), " ")).as("word"))
    // localCheckpoint: four consumers (sc itself, st, wc, t) would each
    // re-run the corpus explode+shuffle lineage — Spark has no shared-
    // subplan materialization (same q2/cluster_canonical note). The
    // checkpointed relation is |sources × vocab| rows (vocabulary-
    // bounded), so pinning it is cheap at any corpus size and every
    // rollup below reduces it, not the corpus.
    val sc = words.groupBy(col("source"), col("word")).agg(count(lit(1)).as("sc"))
      .localCheckpoint()
    val st = sc.groupBy(col("source"))
      .agg(sum(col("sc")).as("st"), count(lit(1)).as("n_terms"))
    val wc = sc.groupBy(col("word")).agg(sum(col("sc")).as("wc"))
    val t = wc.agg(sum(col("wc")).cast("double").as("t"))
    val p = col("sc").cast("double") / col("st").cast("double")
    val q = col("wc").cast("double") / col("t")
    // st is source-keyed (bounded — broadcast stays hinted); wc is
    // WORD-keyed (vocabulary-sized — guarded, VERDICT r16 #1).
    sc.join(broadcast(st), "source")
      .join(VocabGuard.maybeBroadcast(spark, dir, wc), "word")
      .crossJoin(broadcast(t))
      .groupBy(col("source"), col("st").as("n_tokens"), col("n_terms"))
      .agg(rnd(sum(p * log(p / q)), 6).as("kl"))
      .select(col("source"), col("n_tokens"), col("n_terms"), col("kl"))
      .orderBy(col("source"))
  }

  private val klBySourceSql =
    """WITH w AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
      |), sc AS (
      |  SELECT source, word, count(*) AS sc FROM w GROUP BY source, word
      |), st AS (
      |  SELECT source, CAST(sum(sc) AS BIGINT) AS st,
      |    CAST(count(*) AS BIGINT) AS n_terms
      |  FROM sc GROUP BY source
      |), f AS (
      |  SELECT word, CAST(sum(sc) AS BIGINT) AS wc FROM sc GROUP BY word
      |), t AS (
      |  SELECT CAST(sum(wc) AS DOUBLE) AS t FROM f
      |)
      |SELECT sc.source, st.st AS n_tokens, st.n_terms,
      |  CAST(round(CAST(sum((sc.sc / st.st) * ln((sc.sc / st.st) / (f.wc / t.t)))
      |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS kl
      |FROM sc JOIN st USING (source) JOIN f USING (word), t
      |GROUP BY sc.source, st.st, st.n_terms
      |ORDER BY sc.source""".stripMargin

  // ---------------------------------------------------------------
  // Deterministic weighted sample: A-ES-style priority sampling where
  // the usual u^(1/w) exponential key is replaced by INTEGER division
  // of a 60-bit uniform hash by the weight (n_chars) — longer docs get
  // proportionally smaller keys, so the per-language bottom-25 is a
  // weight-biased sample, and the integer math is bit-identical in any
  // engine (no pow/log float divergence, no RNG, stable under corpus
  // growth). One hash + one bounded per-group top-k: the same
  // rank-within-partition shape as win_top_orders_per_cust, which
  // scales as a single shuffle on the group key.
  private def sampleWeighted(spark: SparkSession, dir: String): DataFrame = {
    // weight 0 means "never sample" — filtering also keeps the two
    // engines aligned on the edge (Spark's DIV by zero yields NULL,
    // DuckDB's // raises)
    val keyed = table(spark, dir, "documents")
      .filter(col("n_chars") > 0)
      .withColumn("h", expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) AS bigint)"))
      .withColumn("pri", expr("h DIV n_chars"))
    val w = Window.partitionBy(col("lang")).orderBy(col("pri"), col("doc_id"))
    keyed
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 25)
      .select(col("lang"), col("rk"), col("doc_id"), col("n_chars"), col("pri"))
      .orderBy(col("lang"), col("rk"))
  }

  private val sampleWeightedSql =
    """WITH d AS (
      |  SELECT lang, doc_id, n_chars,
      |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT // n_chars AS pri
      |  FROM documents
      |  WHERE n_chars > 0
      |)
      |SELECT lang, rk, doc_id, n_chars, pri FROM (
      |  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY pri, doc_id) AS rk
      |  FROM d
      |) t
      |WHERE rk <= 25
      |ORDER BY lang, rk""".stripMargin

  // ---------------------------------------------------------------
  // Unigram entropy per document (bits). Computed entirely row-local
  // with higher-order functions — count each distinct word inside the
  // row, fold -p*log2(p) — so the operator is a pure projection: zero
  // shuffle, perfect parallelism at any scale (the per-row cost is
  // O(words * distinct), bounded by document length). The oracle twin
  // computes the identical sum relationally (explode -> two GROUP BYs);
  // summation order differs, which rnd(_, 6) absorbs.
  private def unigramEntropy(spark: SparkSession, dir: String): DataFrame =
    Tables.fanOut(table(spark, dir, "documents"))
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n", size(col("ws")))
      .withColumn("counts", expr("transform(array_distinct(ws), w -> size(filter(ws, x -> x = w)))"))
      .withColumn("entropy_bits", rnd(expr(
        "-aggregate(counts, 0.0D, (acc, c) -> acc + (c / cast(n as double)) * ln(c / cast(n as double))) / ln(2.0)"), 6))
      .select(
        col("doc_id"),
        col("n").as("n_words"),
        size(col("counts")).as("n_distinct"),
        col("entropy_bits"),
        (col("entropy_bits") >= 4.5).as("keep"))
      .orderBy(col("doc_id"))

  private val unigramEntropySql =
    """WITH w AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
      |), c AS (
      |  SELECT doc_id, word, count(*) AS cnt FROM w GROUP BY doc_id, word
      |), n AS (
      |  SELECT doc_id, CAST(sum(cnt) AS DOUBLE) AS n, CAST(count(*) AS INT) AS n_distinct
      |  FROM c GROUP BY doc_id
      |), e AS (
      |  SELECT c.doc_id,
      |    CAST(n.n AS INT) AS n_words,
      |    n.n_distinct,
      |    CAST(round(CAST(-sum((c.cnt / n.n) * ln(c.cnt / n.n)) / ln(2.0)
      |      AS DECIMAL(18,8)), 6) AS DOUBLE) AS entropy_bits
      |  FROM c JOIN n USING (doc_id)
      |  GROUP BY c.doc_id, n.n, n.n_distinct
      |)
      |SELECT doc_id, n_words, n_distinct, entropy_bits,
      |  entropy_bits >= 4.5 AS keep
      |FROM e ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // Cross-entropy of each document against the corpus unigram model —
  // the perplexity-filter analog without an LM: a doc full of globally
  // rare tokens scores high (gibberish/noise), one of common tokens
  // low (boilerplate); the band in between is natural text. Two
  // passes: the corpus frequency table (one word aggregate — orders of
  // magnitude smaller than the corpus, so it usually broadcasts), then
  // a per-doc average of -ln p(word). The frequency table is WORD-keyed
  // and therefore NOT bounded — at 100 TB of web text the type count is
  // 10⁸–10⁹ and a hard broadcast() hint would fail outright, not
  // degrade (VERDICT r16 #1) — so the hint rides the VocabGuard NDV
  // cap: under it, broadcast as before; over it, the join is left
  // un-hinted and plans as an AQE-sized shuffle join with everything
  // else unchanged.
  private def crossEntropy(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.fanOut(table(spark, dir, "documents"))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val freqs = words.groupBy(col("word")).agg(count(lit(1)).as("wc"))
    val total = freqs.agg(sum(col("wc")).cast("double").as("total"))
    words
      .join(VocabGuard.maybeBroadcast(spark, dir, freqs), Seq("word"))
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("int").as("n_words"),
        rnd(avg(-log(col("wc") / col("total"))), 6).as("cross_entropy"))
      .orderBy(col("doc_id"))
  }

  private val crossEntropySql =
    """WITH w AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
      |), f AS (
      |  SELECT word, count(*) AS wc FROM w GROUP BY word
      |), t AS (
      |  SELECT CAST(sum(wc) AS DOUBLE) AS total FROM f
      |)
      |SELECT doc_id,
      |  CAST(count(*) AS INT) AS n_words,
      |  CAST(round(CAST(avg(-ln(wc / total)) AS DECIMAL(18,8)), 6) AS DOUBLE) AS cross_entropy
      |FROM w JOIN f USING (word), t
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // TF-IDF keyword extraction: each document's most distinctive term.
  // Per-(doc, word) term frequencies shuffle once on doc_id; document
  // frequencies are the vocabulary-sized side — guarded broadcast,
  // same VocabGuard story as cross-entropy; the per-doc argmax is a row_number
  // window on the EXISTING doc_id partitioning. Scores are rounded to
  // 1e-6 BEFORE ranking so near-ties collapse to exact ties broken by
  // the word — a last-ulp ln() difference between engines can never
  // flip the chosen keyword.
  private def tfidfKeyword(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.fanOut(table(spark, dir, "documents"))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val tf = words.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    val dfreq = words.groupBy(col("word")).agg(countDistinct(col("doc_id")).as("df"))
    val nDocs = table(spark, dir, "documents").agg(count(lit(1)).cast("double").as("n_docs"))
    val byScore = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("word"))
    tf.join(VocabGuard.maybeBroadcast(spark, dir, dfreq), Seq("word"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score", rnd(col("tf") * log(col("n_docs") / col("df")), 6))
      .withColumn("rk", row_number().over(byScore))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("word").as("keyword"), col("tf").as("keyword_tf"), col("score"))
      .orderBy(col("doc_id"))
  }

  private val tfidfKeywordSql =
    """WITH w AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
      |), tf AS (
      |  SELECT doc_id, word, count(*) AS tf FROM w GROUP BY doc_id, word
      |), dfreq AS (
      |  SELECT word, count(DISTINCT doc_id) AS df FROM w GROUP BY word
      |), n AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents
      |), scored AS (
      |  SELECT doc_id, word, tf,
      |    CAST(round(CAST(tf * ln(n_docs / df) AS DECIMAL(18,8)), 6) AS DOUBLE) AS score
      |  FROM tf JOIN dfreq USING (word), n
      |)
      |SELECT doc_id, word AS keyword, tf AS keyword_tf, score FROM (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, word) AS rk
      |  FROM scored) t
      |WHERE rk = 1
      |ORDER BY doc_id""".stripMargin
}
