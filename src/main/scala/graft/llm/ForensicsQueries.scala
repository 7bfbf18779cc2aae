package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{NamedQuery, Tables}
import graft.ops.Registry.{dec, rnd}
import graft.ops.Tables.table

/** Corpus forensics — selection and diagnosis signals over the raw
  * corpus that the dedup/eval families don't cover:
  *
  *  - [[dsirWeights]] — Data Selection via Importance Resampling
  *    (Xie et al. 2023): per-document importance log-weights from
  *    hashed-unigram language models of a curated target slice vs
  *    the raw corpus. The published recipe for "make the crawl look
  *    like the target distribution" at pretraining scale.
  *  - [[heapsFit]] — Heaps'-law vocabulary-growth fit: V(T) ~ K·T^b
  *    over corpus-order prefixes; a sub-linear exponent is the
  *    canonical health check that a corpus keeps contributing new
  *    vocabulary (duplicated/templated corpora flatten early).
  *  - [[sourceAffinity]] — cross-source near-duplicate matrix: which
  *    sources copy from which, aggregated from word-level Jaccard
  *    pairs keyed WITHOUT the source column (the within-source twin
  *    is dedup_jaccard_pairs).
  */
object ForensicsQueries {

  def queries: Vector[NamedQuery] = Vector(
    NamedQuery("text_dsir_weights", dsirWeights, Some(dsirWeightsSql)),
    NamedQuery("text_heaps_fit", heapsFit, Some(heapsFitSql)),
    NamedQuery("dedup_source_affinity", sourceAffinity, Some(sourceAffinitySql)),
  )

  // ---------------------------------------------------------------
  // DSIR importance weights. Features are words hashed into 512
  // buckets (md5-prefix, the portable-hash idiom the split/priority
  // queries use); the "target" is the curated slice a practitioner
  // would hold up as exemplary — here sources src0-src3 stand in,
  // swap any predicate. Per bucket b:
  //   delta(b) = ln p_target(b) - ln p_raw(b)   (add-1 smoothed)
  // and a document's importance log-weight is SUM_w delta(bucket(w)).
  // Docs scoring > 0 look more like the target than the crawl;
  // resampling by softmax(logw) is the published selection step.
  //
  // Scale shape: ONE corpus pass builds per-(doc, bucket) counts
  // (map-side combine); the two LMs live on a 512-row table that
  // broadcast-joins back — the corpus is never rescanned and nothing
  // global exists beyond the 512-row LM. Exactly the tfidf/KL
  // vocab-bounded-broadcast posture.
  //
  // Determinism: both ln's snap to 6 dp (their difference is then a
  // bit-exact double on both engines), per-word terms snap to
  // DECIMAL(18,8) before the exact decimal per-doc sum.
  private val DsirBuckets = 512
  private val targetSources = Seq("src0", "src1", "src2", "src3")

  private def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.fanOut(table(spark, dir, "documents"))
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("w"))
      .withColumn("b",
        expr(s"cast(conv(substring(md5(w), 1, 6), 16, 10) AS bigint) % $DsirBuckets"))
    val db = words.groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("cnt"))
    val isTarget = col("source").isInCollection(targetSources)
    val lm = words.groupBy(col("b"))
      .agg(
        sum(when(isTarget, 1L).otherwise(0L)).as("t"),
        count(lit(1)).as("r"))
    val wAll = Window.partitionBy()
    val delta = lm
      .withColumn("tt", sum(col("t")).over(wAll))
      .withColumn("rt", sum(col("r")).over(wAll))
      .select(col("b"),
        (rnd(log((col("t") + lit(1.0)) / (col("tt") + lit(DsirBuckets.toDouble))), 6) -
          rnd(log((col("r") + lit(1.0)) / (col("rt") + lit(DsirBuckets.toDouble))), 6))
          .as("delta"))
    db.join(broadcast(delta), "b")
      .groupBy(col("doc_id"))
      .agg(
        sum(col("cnt")).as("n_words"),
        sum(round((col("cnt") * col("delta")).cast("decimal(18,8)"), 8))
          .cast("double").as("logw"))
      .select(col("doc_id"), col("n_words"),
        rnd(col("logw"), 4).as("dsir_logw"),
        rnd(col("logw") / col("n_words"), 6).as("dsir_avg"),
        (rnd(col("logw"), 4) > 0.0).as("keep"))
      .orderBy(col("doc_id"))
  }

  private val dsirWeightsSql = {
    val tgt = targetSources.map(s => s"'$s'").mkString(", ")
    s"""WITH words AS (
      |  SELECT doc_id, source,
      |    ('0x' || substring(md5(w), 1, 6))::BIGINT % $DsirBuckets AS b
      |  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w FROM documents)
      |), db AS (
      |  SELECT doc_id, b, count(*) AS cnt FROM words GROUP BY doc_id, b
      |), lm AS (
      |  SELECT b,
      |    sum(CASE WHEN source IN ($tgt) THEN 1 ELSE 0 END) AS t,
      |    count(*) AS r
      |  FROM words GROUP BY b
      |), d AS (
      |  SELECT b,
      |    CAST(round(CAST(ln((t + 1.0) / (sum(t) OVER () + $DsirBuckets.0)) AS DECIMAL(18,8)), 6) AS DOUBLE)
      |    - CAST(round(CAST(ln((r + 1.0) / (sum(r) OVER () + $DsirBuckets.0)) AS DECIMAL(18,8)), 6) AS DOUBLE) AS delta
      |  FROM lm
      |), s AS (
      |  SELECT doc_id,
      |    CAST(sum(cnt) AS BIGINT) AS n_words,
      |    CAST(sum(round(CAST(cnt * delta AS DECIMAL(18,8)), 8)) AS DOUBLE) AS logw
      |  FROM db JOIN d USING (b) GROUP BY doc_id
      |)
      |SELECT doc_id, n_words,
      |  CAST(round(CAST(logw AS DECIMAL(18,8)), 4) AS DOUBLE) AS dsir_logw,
      |  CAST(round(CAST(logw / n_words AS DECIMAL(18,8)), 6) AS DOUBLE) AS dsir_avg,
      |  (CAST(round(CAST(logw AS DECIMAL(18,8)), 4) AS DOUBLE) > 0.0) AS keep
      |FROM s ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------
  // Heaps'-law vocabulary growth. The corpus (in doc_id order) is cut
  // into 16 equal-width prefix buckets; V(k) = distinct 3-gram types
  // seen in buckets <= k, T(k) = 3-gram tokens seen — computed
  // WITHOUT any cumulative distinct-count: each type contributes to
  // exactly its FIRST bucket (min over one shuffle), so the growth
  // curve is two 16-row cumulative sums. The log-log least-squares
  // slope is the Heaps exponent (the zipf_fit regression discipline
  // on 16 points). 3-grams, not unigrams: the fixture lexicon is a
  // few dozen words (saturates in the first bucket — a flat,
  // unfittable curve), while the 3-gram type space is large enough
  // that the curve genuinely bends; on a real crawl both work and
  // the n=1 instantiation is the classical law.
  //
  // Scale shape: one corpus pass to (type -> first bucket) + token
  // counts; everything after lives on 16-row tables (their window is
  // bounded by construction, like zipf's <= 1000-row rank window).
  private val HeapsBuckets = 16

  private def heapsFit(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val bounds = docs.agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
    val words = Tables.fanOut(docs).crossJoin(broadcast(bounds))
      .withColumn("ws", split(col("text"), " "))
      .where(size(col("ws")) >= 3)
      .select(
        expr(s"((doc_id - mn) * $HeapsBuckets) div (mx - mn + 1)").as("bucket"),
        explode(expr(
          "transform(sequence(1, size(ws) - 2), i -> concat_ws(' ', slice(ws, i, 3)))")).as("w"))
    val tok = words.groupBy(col("bucket")).agg(count(lit(1)).as("tk"))
    val vocab = words.groupBy(col("w")).agg(min(col("bucket")).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("vb"))
    val wCum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NOTE (r18 A/B): pinning `rows` (localCheckpoint) was tried and
    // REVERTED — under the bench's count() action the optimizer prunes
    // the un-consumed fit/vocab branches of the lazy form, so the pin
    // made the measured query 0.44->0.79 s by computing them eagerly;
    // the full-materialization path (Verify) pays the replay either
    // way at bucket-bounded size.
    val rows = tok.join(vocab, Seq("bucket"), "left")
      .withColumn("vb", coalesce(col("vb"), lit(0L)))
      .withColumn("tokens_cum", sum(col("tk")).over(wCum))
      .withColumn("vocab_cum", sum(col("vb")).over(wCum))
      .select(col("bucket"), col("tokens_cum"), col("vocab_cum"))
    val pts = rows.select(
      round(log(col("tokens_cum").cast("double")), 6).cast("decimal(12,6)").as("x"),
      round(log(col("vocab_cum").cast("double")), 6).cast("decimal(12,6)").as("y"))
    val m = pts.agg(
      count(lit(1)).as("n"),
      round(sum(col("x")), 6).cast("double").as("sx"),
      round(sum(col("y")), 6).cast("double").as("sy"),
      round(sum(col("x") * col("y")), 6).cast("double").as("sxy"),
      round(sum(col("x") * col("x")), 6).cast("double").as("sxx"),
      round(sum(col("y") * col("y")), 6).cast("double").as("syy"))
    val fit = m.select(
      rnd((col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx")), 4).as("beta"),
      rnd(((col("n") * col("sxy") - col("sx") * col("sy")) *
        (col("n") * col("sxy") - col("sx") * col("sy"))) /
        ((col("n") * col("sxx") - col("sx") * col("sx")) *
          (col("n") * col("syy") - col("sy") * col("sy"))), 4).as("r2"))
    rows.crossJoin(broadcast(fit))
      .select(col("bucket"), col("tokens_cum"), col("vocab_cum"), col("beta"), col("r2"))
      .orderBy(col("bucket"))
  }

  private val heapsFitSql =
    s"""WITH bounds AS (
      |  SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM documents
      |), docs3 AS (
      |  SELECT ((doc_id - mn) * $HeapsBuckets) // (mx - mn + 1) AS bucket,
      |    string_split(text, ' ') AS ws
      |  FROM documents, bounds
      |  WHERE len(string_split(text, ' ')) >= 3
      |), words AS (
      |  SELECT bucket,
      |    unnest(list_transform(range(1, len(ws) - 1),
      |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS w
      |  FROM docs3
      |), tok AS (
      |  SELECT bucket, count(*) AS tk FROM words GROUP BY bucket
      |), vocab AS (
      |  SELECT bucket, count(*) AS vb
      |  FROM (SELECT w, min(bucket) AS bucket FROM words GROUP BY w)
      |  GROUP BY bucket
      |), rows_ AS (
      |  SELECT t.bucket,
      |    CAST(sum(t.tk) OVER (ORDER BY t.bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tokens_cum,
      |    CAST(sum(coalesce(v.vb, 0)) OVER (ORDER BY t.bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS vocab_cum
      |  FROM tok t LEFT JOIN vocab v ON v.bucket = t.bucket
      |), pts AS (
      |  SELECT CAST(round(ln(CAST(tokens_cum AS DOUBLE)), 6) AS DECIMAL(12,6)) AS x,
      |    CAST(round(ln(CAST(vocab_cum AS DOUBLE)), 6) AS DECIMAL(12,6)) AS y
      |  FROM rows_
      |), m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(round(sum(x), 6) AS DOUBLE) AS sx,
      |    CAST(round(sum(y), 6) AS DOUBLE) AS sy,
      |    CAST(round(sum(x * y), 6) AS DOUBLE) AS sxy,
      |    CAST(round(sum(x * x), 6) AS DOUBLE) AS sxx,
      |    CAST(round(sum(y * y), 6) AS DOUBLE) AS syy
      |  FROM pts
      |), fit AS (
      |  SELECT
      |    CAST(round(CAST((n * sxy - sx * sy) / (n * sxx - sx * sx) AS DECIMAL(18,8)), 4) AS DOUBLE) AS beta,
      |    CAST(round(CAST(((n * sxy - sx * sy) * (n * sxy - sx * sy))
      |      / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS DECIMAL(18,8)), 4) AS DOUBLE) AS r2
      |  FROM m
      |)
      |SELECT bucket, tokens_cum, vocab_cum, beta, r2
      |FROM rows_, fit ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------
  // Cross-source near-duplicate affinity matrix — provenance
  // forensics: for every pair of sources, how many near-duplicate
  // document pairs (word-Jaccard >= 0.2) connect them, and how
  // strong the overlap is. Within-source rows (src_a = src_b) are
  // internal duplication; off-diagonal rows are the "who copies from
  // whom" signal that drives source-level dedup priorities and
  // contamination audits.
  //
  // Scale shape: the candidate generator is the df-capped posting-
  // list join keyed on (lang, word) — the dedup_jaccard_capped
  // machinery with the source column REMOVED from the key so pairs
  // cross sources (postings with df > 64 are dropped: stopword-like
  // words generate quadratic candidates but can't push Jaccard of
  // realistic docs over the threshold on their own; the capped-twin
  // contract). Pair scores aggregate straight down to the
  // |sources|^2 matrix — the corpus-size-independent output.
  private val AffinityDfCap = 64
  private val AffinityMinSim = 0.2

  private def sourceAffinity(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val words = docs.select(col("doc_id"), col("lang"),
      explode(array_distinct(split(col("text"), " "))).as("w"))
    val sizes = docs.select(col("doc_id"),
      size(array_distinct(split(col("text"), " "))).as("sz"),
      col("source"))
    val posting = words.groupBy(col("lang"), col("w"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, AffinityDfCap))
    val pairs = posting
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "a_id")))
      .select(col("a_id"), explode(expr("slice(ids, i + 2, size(ids))")).as("b_id"))
    val inter = pairs.groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("inter"))
    val scored = inter
      .join(broadcast(sizes.select(col("doc_id").as("a_id"), col("sz").as("sa"),
        col("source").as("source_a"))), "a_id")
      .join(broadcast(sizes.select(col("doc_id").as("b_id"), col("sz").as("sb"),
        col("source").as("source_b"))), "b_id")
      .withColumn("jaccard",
        rnd(col("inter").cast("double") / (col("sa") + col("sb") - col("inter")), 4))
      .filter(col("jaccard") >= AffinityMinSim)
    scored
      .select(
        least(col("source_a"), col("source_b")).as("src_a"),
        greatest(col("source_a"), col("source_b")).as("src_b"),
        col("jaccard"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(
        count(lit(1)).as("n_pairs"),
        rnd(sum(dec(col("jaccard"))).cast("double") / count(lit(1)), 4).as("mean_jaccard"),
        max(col("jaccard")).as("max_jaccard"))
      .orderBy(col("src_a"), col("src_b"))
  }

  private val sourceAffinitySql =
    s"""WITH words AS (
      |  SELECT doc_id, lang, unnest(list_distinct(string_split(text, ' '))) AS w
      |  FROM documents
      |), df AS (
      |  SELECT lang, w, count(*) AS df FROM words GROUP BY lang, w
      |), kept AS (
      |  SELECT wo.doc_id, wo.lang, wo.w
      |  FROM words wo JOIN df d ON wo.lang = d.lang AND wo.w = d.w
      |  WHERE d.df BETWEEN 2 AND $AffinityDfCap
      |), sizes AS (
      |  SELECT doc_id, len(list_distinct(string_split(text, ' '))) AS sz, source
      |  FROM documents
      |), inter AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
      |  FROM kept a JOIN kept b
      |    ON a.lang = b.lang AND a.w = b.w AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id
      |), scored AS (
      |  SELECT sa.source AS source_a, sb.source AS source_b,
      |    CAST(round(CAST(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter)
      |      AS DECIMAL(18,8)), 4) AS DOUBLE) AS jaccard
      |  FROM inter
      |  JOIN sizes sa ON sa.doc_id = a_id
      |  JOIN sizes sb ON sb.doc_id = b_id
      |)
      |SELECT least(source_a, source_b) AS src_a,
      |  greatest(source_a, source_b) AS src_b,
      |  count(*) AS n_pairs,
      |  CAST(round(CAST(CAST(sum(CAST(jaccard AS DECIMAL(18,4))) AS DOUBLE) / count(*)
      |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS mean_jaccard,
      |  max(jaccard) AS max_jaccard
      |FROM scored
      |WHERE jaccard >= $AffinityMinSim
      |GROUP BY least(source_a, source_b), greatest(source_a, source_b)
      |ORDER BY src_a, src_b""".stripMargin
}
