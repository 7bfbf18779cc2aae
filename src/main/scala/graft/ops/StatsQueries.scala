package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Registry.{dec, rnd}

/** Statistical-testing operators — the hypothesis-testing /
  * feature-association half of the eval family:
  *
  *  - [[miAssociation]] — mutual information, chi-square and Cramér's
  *    V between two categorical columns (source × lang). THE
  *    feature-association screen: after ONE corpus reduction to the
  *    |S|×|L| contingency table, everything is window math on ≤100
  *    rows.
  *  - [[ksBySource]] — two-sample Kolmogorov–Smirnov statistic of the
  *    quality-score distribution, each source vs the rest of the
  *    corpus. Train/serve-skew and per-shard drift detection; the
  *    supremum runs over the DISCRETE score grid with an
  *    integer-exact argmax (cross-multiplied CDFs — no float compare
  *    picks the winner).
  *  - [[bestSplit]] — decision-stump / supervised-discretization
  *    step: information gain of every score threshold from one corpus
  *    pass (the same 20-bucket reduction as eval_threshold_sweep,
  *    scored by entropy instead of P/R).
  *  - [[trimmedMean]] — 5% two-sided trimmed and winsorized means per
  *    event type: the robust-aggregation idiom via broadcast
  *    percentile thresholds (no global sort; thresholds snap to the
  *    DATA's own 4-dp grain so the trim boundary cannot drift
  *    cross-engine).
  *
  * All four are oracle-twinned; determinism follows the Registry
  * DECIMAL-snap discipline (FIXTURES.md): counts stay integer as long
  * as possible, every transcendental snaps before it aggregates.
  */
object StatsQueries {

  def queries: Vector[NamedQuery] = Vector(
    NamedQuery("eval_mi_association", miAssociation, Some(miAssociationSql)),
    NamedQuery("eval_ks_by_source", ksBySource, Some(ksBySourceSql)),
    NamedQuery("eval_best_split", bestSplit, Some(bestSplitSql)),
    NamedQuery("agg_trimmed_mean", trimmedMean, Some(trimmedMeanSql)),
    NamedQuery("eval_ols_doclen", olsDoclen, Some(olsDoclenSql)),
    NamedQuery("eval_wasserstein_drift", wassersteinBySource, Some(wassersteinBySourceSql)),
    NamedQuery("eval_conformal_threshold", conformalThreshold, Some(conformalThresholdSql)),
    NamedQuery("events_ab_cuped", abCuped, Some(abCupedSql)),
    NamedQuery("agg_kmv_distinct", kmvDistinct, Some(kmvDistinctSql)),
    NamedQuery("audit_benford", auditBenford, Some(auditBenfordSql)),
    NamedQuery("audit_profile_events", auditProfile, Some(auditProfileSql)),
    NamedQuery("eval_bootstrap_ci", bootstrapCi, Some(bootstrapCiSql)),
    NamedQuery("eval_rank_fusion", rankFusion, Some(rankFusionSql)),
    NamedQuery("eval_theilsen_trend", theilsenTrend, Some(theilsenTrendSql)),
    NamedQuery("agg_countmin_audit", countMinAudit, Some(countMinAuditSql)),
    NamedQuery("events_power_analysis", powerAnalysis, Some(powerAnalysisSql)),
    NamedQuery("eval_permutation_test", permutationTest, Some(permutationTestSql)),
    NamedQuery("events_did_readout", didReadout, Some(didReadoutSql)),
    NamedQuery("eval_mannwhitney", mannWhitney, Some(mannWhitneySql)),
    NamedQuery("eval_kendall_tau", kendallTau, Some(kendallTauSql)),
  )

  private val Ln2 = 0.6931471805599453

  // ---------------------------------------------------------------
  // Mutual information / chi-square / Cramér's V between source and
  // lang. Scale shape: ONE partial-agg pass reduces the corpus to the
  // contingency table (|sources| × |langs| rows); marginals, expected
  // counts and both statistics are windows over that tiny frame, and
  // the (r, c) cardinalities ride a broadcast 1-row agg. At 100 TB
  // nothing after the first shuffle touches more than |S|·|L| rows.
  //
  // Determinism: p and the expected-count ratio are exact long/long
  // divisions; ln snaps at 6 dp (the markov-entropy discipline), each
  // cell term at 8 (MI) / 6 (chi2) dp, cell terms sum in DECIMAL.
  private def miAssociation(spark: SparkSession, dir: String): DataFrame = {
    val joint = Tables.table(spark, dir, "documents")
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("n_sl"))
    val dims = joint
      .agg(countDistinct(col("source")).as("r"), countDistinct(col("lang")).as("c"))
    val wS = Window.partitionBy(col("source"))
    val wL = Window.partitionBy(col("lang"))
    val wAll = Window.partitionBy()
    val cells = joint
      .withColumn("n_s", sum(col("n_sl")).over(wS))
      .withColumn("n_l", sum(col("n_sl")).over(wL))
      .withColumn("n", sum(col("n_sl")).over(wAll))
      .withColumn("p", col("n_sl").cast("double") / col("n"))
      .withColumn("lnr", rnd(log((col("n_sl") * col("n")).cast("double")
        / (col("n_s") * col("n_l")).cast("double")), 6))
      .withColumn("mi_term", round((col("p") * col("lnr")).cast("decimal(18,8)"), 8))
      .withColumn("e", (col("n_s") * col("n_l")).cast("double") / col("n"))
      .withColumn("chi_term",
        round((pow(col("n_sl").cast("double") - col("e"), 2.0) / col("e")).cast("decimal(18,8)"), 6))
      .withColumn("mi_bits", rnd(sum(col("mi_term")).over(wAll).cast("double") / Ln2, 6))
      .withColumn("chi2", rnd(sum(col("chi_term")).over(wAll).cast("double"), 4))
    cells
      .groupBy(col("source"))
      .agg(
        sum(col("n_sl")).as("n_docs"),
        rnd(sum(col("mi_term")).cast("double") / Ln2, 6).as("mi_part_bits"),
        rnd(sum(col("chi_term")).cast("double"), 4).as("chi2_part"),
        max(col("mi_bits")).as("mi_bits"),
        max(col("chi2")).as("chi2"),
        max(col("n")).as("n"))
      .crossJoin(broadcast(dims))
      .withColumn("cramers_v", rnd(sqrt(col("chi2")
        / (col("n") * least(col("r") - 1, col("c") - 1)).cast("double")), 6))
      .select(col("source"), col("n_docs"), col("mi_part_bits"), col("chi2_part"),
        col("mi_bits"), col("chi2"), col("cramers_v"))
      .orderBy(col("source"))
  }

  private val miAssociationSql =
    """WITH joint AS (
      |  SELECT source, lang, count(*) AS n_sl FROM documents GROUP BY 1, 2
      |), dims AS (
      |  SELECT count(DISTINCT source) AS r, count(DISTINCT lang) AS c FROM documents
      |), cells AS (
      |  SELECT source, lang, n_sl,
      |    sum(n_sl) OVER (PARTITION BY source) AS n_s,
      |    sum(n_sl) OVER (PARTITION BY lang) AS n_l,
      |    sum(n_sl) OVER () AS n
      |  FROM joint
      |), terms AS (
      |  SELECT source, n_sl, n,
      |    round(CAST((CAST(n_sl AS DOUBLE) / n) *
      |      CAST(round(CAST(ln(CAST(n_sl * n AS DOUBLE) / CAST(n_s * n_l AS DOUBLE))
      |        AS DECIMAL(18,8)), 6) AS DOUBLE)
      |      AS DECIMAL(18,8)), 8) AS mi_term,
      |    round(CAST(pow(CAST(n_sl AS DOUBLE) - CAST(n_s * n_l AS DOUBLE) / n, 2.0)
      |      / (CAST(n_s * n_l AS DOUBLE) / n) AS DECIMAL(18,8)), 6) AS chi_term
      |  FROM cells
      |), g AS (
      |  SELECT CAST(round(CAST(CAST(sum(mi_term) AS DOUBLE) / 0.6931471805599453
      |      AS DECIMAL(18,8)), 6) AS DOUBLE) AS mi_bits,
      |    CAST(round(CAST(CAST(sum(chi_term) AS DOUBLE) AS DECIMAL(18,8)), 4) AS DOUBLE) AS chi2,
      |    any_value(n) AS n
      |  FROM terms
      |)
      |SELECT t.source,
      |  CAST(sum(t.n_sl) AS BIGINT) AS n_docs,
      |  CAST(round(CAST(CAST(sum(t.mi_term) AS DOUBLE) / 0.6931471805599453
      |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS mi_part_bits,
      |  CAST(round(CAST(CAST(sum(t.chi_term) AS DOUBLE) AS DECIMAL(18,8)), 4) AS DOUBLE) AS chi2_part,
      |  any_value(g.mi_bits) AS mi_bits,
      |  any_value(g.chi2) AS chi2,
      |  CAST(round(CAST(sqrt(any_value(g.chi2)
      |    / CAST(any_value(g.n) * least(any_value(d.r) - 1, any_value(d.c) - 1) AS DOUBLE))
      |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS cramers_v
      |FROM terms t, g, dims d
      |GROUP BY t.source ORDER BY t.source""".stripMargin

  // ---------------------------------------------------------------
  // Two-sample KS statistic per source: sup over the score grid of
  // |F_source(v) - F_rest(v)|, quality score at its native 3-dp grain.
  //
  // Scale shape: one corpus pass reduces to (source, score) counts
  // (≤ |S|·1001 rows); the CDF windows, the complement and the
  // supremum all run on that reduction. The grid is densified per
  // source (every source's CDF is evaluated at every global step
  // point) via a broadcast cross of two tiny dimension frames.
  //
  // Exactness: the argmax runs on |cum_s·n_r - cum_rest·n_s| — pure
  // integer cross-multiplication, so no float comparison ever picks
  // the supremum; only the final reported ratio floats (then snaps).
  private def ksBySource(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.table(spark, dir, "documents")
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("n_stop", expr(
        "size(filter(ws, w -> w IN ('the','a','and','of','to','in')))").cast("long"))
      .withColumn("v", rnd(
        lit(0.5) * least(col("n_words").cast("double") / 100.0, lit(1.0)) +
          lit(0.5) * (lit(1.0) - rnd(col("n_stop").cast("double") / col("n_words"), 3)),
        3))
    val counts = scored.groupBy(col("source"), col("v")).agg(count(lit(1)).as("cnt"))
    val sources = counts.groupBy(col("source")).agg(sum(col("cnt")).as("n_in"))
    val grid = counts.select(col("v")).distinct()
    val perV = counts.groupBy(col("v")).agg(sum(col("cnt")).as("cnt_all"))
    val wAllByV = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumAll = perV.withColumn("cum_all", sum(col("cnt_all")).over(wAllByV))
      .select(col("v"), col("cum_all"))
    val wSrc = Window.partitionBy(col("source")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dense = sources.crossJoin(grid) // |S| x |grid| — both tiny reductions
      .join(counts, Seq("source", "v"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .withColumn("cum_s", sum(col("cnt")).over(wSrc))
      .join(broadcast(cumAll), Seq("v"))
      .withColumn("n", max(col("cum_all")).over(Window.partitionBy()))
      .withColumn("n_rest", col("n") - col("n_in"))
      .withColumn("cum_rest", col("cum_all") - col("cum_s"))
      .withColumn("num", abs(col("cum_s") * col("n_rest") - col("cum_rest") * col("n_in")))
    dense.groupBy(col("source"))
      .agg(
        max(col("n_in")).as("n_in"),
        max(col("n_rest")).as("n_rest"),
        max(col("num")).as("max_num"))
      .withColumn("ks_stat",
        rnd(col("max_num").cast("double") / (col("n_in") * col("n_rest")).cast("double"), 6))
      .withColumn("ks_scaled", rnd(col("ks_stat") * sqrt(
        (col("n_in") * col("n_rest")).cast("double") / (col("n_in") + col("n_rest")).cast("double")), 4))
      .select(col("source"), col("n_in"), col("n_rest"), col("ks_stat"), col("ks_scaled"))
      .orderBy(col("source"))
  }

  private val ksBySourceSql =
    """WITH scored AS (
      |  SELECT source,
      |    CAST(round(CAST(0.5 * least(CAST(n_words AS DOUBLE) / 100.0, 1.0)
      |      + 0.5 * (1.0 - CAST(round(CAST(CAST(n_stop AS DOUBLE) / n_words AS DECIMAL(18,8)), 3) AS DOUBLE))
      |      AS DECIMAL(18,8)), 3) AS DOUBLE) AS v
      |  FROM (
      |    SELECT source,
      |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
      |      CAST(len(list_filter(string_split(text, ' '),
      |        w -> w IN ('the','a','and','of','to','in'))) AS BIGINT) AS n_stop
      |    FROM documents
      |  )
      |), counts AS (
      |  SELECT source, v, count(*) AS cnt FROM scored GROUP BY 1, 2
      |), sources AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_in FROM counts GROUP BY 1),
      |grid AS (SELECT DISTINCT v FROM counts),
      |cum_all AS (
      |  SELECT v, CAST(sum(cnt_all) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_all
      |  FROM (SELECT v, sum(cnt) AS cnt_all FROM counts GROUP BY 1)
      |), dense AS (
      |  SELECT s.source, g.v, s.n_in,
      |    CAST(sum(coalesce(c.cnt, 0)) OVER (PARTITION BY s.source ORDER BY g.v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_s,
      |    a.cum_all
      |  FROM sources s CROSS JOIN grid g
      |  LEFT JOIN counts c ON c.source = s.source AND c.v = g.v
      |  JOIN cum_all a ON a.v = g.v
      |), m AS (
      |  SELECT source, n_in,
      |    (SELECT max(cum_all) FROM cum_all) - n_in AS n_rest,
      |    max(abs(cum_s * ((SELECT max(cum_all) FROM cum_all) - n_in)
      |      - (cum_all - cum_s) * n_in)) AS max_num
      |  FROM dense GROUP BY source, n_in
      |)
      |SELECT source, n_in, n_rest,
      |  CAST(round(CAST(CAST(max_num AS DOUBLE) / CAST(n_in * n_rest AS DOUBLE)
      |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS ks_stat,
      |  CAST(round(CAST(CAST(round(CAST(CAST(max_num AS DOUBLE) / CAST(n_in * n_rest AS DOUBLE)
      |      AS DECIMAL(18,8)), 6) AS DOUBLE)
      |    * sqrt(CAST(n_in * n_rest AS DOUBLE) / CAST(n_in + n_rest AS DOUBLE))
      |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS ks_scaled
      |FROM m ORDER BY source""".stripMargin

  // ---------------------------------------------------------------
  // Decision stump: information gain of every threshold of the
  // stopword-ratio score against the is-English label — supervised
  // discretization / the inner loop of tree induction. Same one-pass
  // 20-bucket reduction as eval_threshold_sweep; the entropy algebra
  // runs on the 20-row frame.
  //
  // Determinism: entropies are built from exact long counts; each
  // -p·ln p term snaps at 6 dp, weighted child entropies and the gain
  // snap at 6; the best flag compares two identically-snapped doubles
  // (exact), so ties flag deterministically.
  private def bestSplit(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark; import spark2.implicits._
    val byBucket = Tables.table(spark, dir, "documents")
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("n_stop", expr(
        "size(filter(ws, w -> w IN ('the','a','and','of','to','in')))").cast("long"))
      .withColumn("bucket", least(expr("(n_stop * 20) div n_words"), lit(19L)))
      .withColumn("pos", when(col("lang") === "en", 1L).otherwise(0L))
      .groupBy(col("bucket"))
      .agg(sum(col("pos")).as("n_pos"), sum(lit(1L) - col("pos")).as("n_neg"))
    // entropy of a (pos, neg) pair in bits, every transcendental snapped
    def h(p: Column, q: Column): Column = {
      val n = p + q
      def term(c: Column): Column =
        when(c === 0 || n === 0, lit(0.0))
          .otherwise(-(c.cast("double") / n) * rnd(log(c.cast("double") / n), 6))
      rnd((rnd(term(p), 6) + rnd(term(q), 6)) / Ln2, 6)
    }
    val grid = (0L to 19L).toDF("thr_idx")
    val wTop = Window.orderBy(col("thr_idx").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    grid.join(byBucket, col("thr_idx") === col("bucket"), "left")
      .withColumn("bp", coalesce(col("n_pos"), lit(0L)))
      .withColumn("bn", coalesce(col("n_neg"), lit(0L)))
      .withColumn("hi_pos", sum(col("bp")).over(wTop))
      .withColumn("hi_neg", sum(col("bn")).over(wTop))
      .withColumn("p_total", sum(col("bp")).over(wAll))
      .withColumn("n_total", sum(col("bn")).over(wAll))
      .withColumn("lo_pos", col("p_total") - col("hi_pos"))
      .withColumn("lo_neg", col("n_total") - col("hi_neg"))
      .withColumn("n_hi", col("hi_pos") + col("hi_neg"))
      .withColumn("n_lo", col("lo_pos") + col("lo_neg"))
      .withColumn("n_all", col("p_total") + col("n_total"))
      .withColumn("h_parent", h(col("p_total"), col("n_total")))
      .withColumn("h_children", rnd(
        (col("n_hi").cast("double") / col("n_all")) * h(col("hi_pos"), col("hi_neg")) +
          (col("n_lo").cast("double") / col("n_all")) * h(col("lo_pos"), col("lo_neg")), 6))
      .withColumn("gain_bits", rnd(col("h_parent") - col("h_children"), 6))
      .withColumn("is_best",
        when(col("gain_bits") === max(col("gain_bits")).over(wAll), 1).otherwise(0).cast("int"))
      .select(col("thr_idx"), col("n_hi"), col("n_lo"), col("gain_bits"), col("is_best"))
      .orderBy(col("thr_idx"))
  }

  private val bestSplitSql =
    """WITH scored AS (
      |  SELECT least((CAST(len(list_filter(string_split(text, ' '),
      |        w -> w IN ('the','a','and','of','to','in'))) AS BIGINT) * 20)
      |      // CAST(len(string_split(text, ' ')) AS BIGINT), 19) AS bucket,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      |  FROM documents
      |), bb AS (
      |  SELECT bucket, CAST(sum(pos) AS BIGINT) AS n_pos,
      |    CAST(sum(1 - pos) AS BIGINT) AS n_neg
      |  FROM scored GROUP BY 1
      |), grid AS (SELECT unnest(generate_series(0, 19)) AS thr_idx),
      |c AS (
      |  SELECT g.thr_idx,
      |    CAST(sum(coalesce(bb.n_pos, 0)) OVER (ORDER BY g.thr_idx DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS hi_pos,
      |    CAST(sum(coalesce(bb.n_neg, 0)) OVER (ORDER BY g.thr_idx DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS hi_neg,
      |    CAST(sum(coalesce(bb.n_pos, 0)) OVER () AS BIGINT) AS p_total,
      |    CAST(sum(coalesce(bb.n_neg, 0)) OVER () AS BIGINT) AS n_total
      |  FROM grid g LEFT JOIN bb ON bb.bucket = g.thr_idx
      |), e AS (
      |  SELECT thr_idx, hi_pos, hi_neg, p_total, n_total,
      |    p_total - hi_pos AS lo_pos, n_total - hi_neg AS lo_neg,
      |    hi_pos + hi_neg AS n_hi,
      |    (p_total - hi_pos) + (n_total - hi_neg) AS n_lo,
      |    p_total + n_total AS n_all
      |  FROM c
      |), macro_h AS (
      |  SELECT *,
      |    CAST(round(CAST((
      |      CAST(round(CAST(CASE WHEN p_total = 0 OR p_total + n_total = 0 THEN 0.0
      |        ELSE -(CAST(p_total AS DOUBLE)/(p_total+n_total)) * CAST(round(CAST(ln(CAST(p_total AS DOUBLE)/(p_total+n_total)) AS DECIMAL(18,8)), 6) AS DOUBLE) END AS DECIMAL(18,8)), 6) AS DOUBLE)
      |      + CAST(round(CAST(CASE WHEN n_total = 0 OR p_total + n_total = 0 THEN 0.0
      |        ELSE -(CAST(n_total AS DOUBLE)/(p_total+n_total)) * CAST(round(CAST(ln(CAST(n_total AS DOUBLE)/(p_total+n_total)) AS DECIMAL(18,8)), 6) AS DOUBLE) END AS DECIMAL(18,8)), 6) AS DOUBLE)
      |    ) / 0.6931471805599453 AS DECIMAL(18,8)), 6) AS DOUBLE) AS h_parent,
      |    CAST(round(CAST((
      |      CAST(round(CAST(CASE WHEN hi_pos = 0 OR n_hi = 0 THEN 0.0
      |        ELSE -(CAST(hi_pos AS DOUBLE)/n_hi) * CAST(round(CAST(ln(CAST(hi_pos AS DOUBLE)/n_hi) AS DECIMAL(18,8)), 6) AS DOUBLE) END AS DECIMAL(18,8)), 6) AS DOUBLE)
      |      + CAST(round(CAST(CASE WHEN hi_neg = 0 OR n_hi = 0 THEN 0.0
      |        ELSE -(CAST(hi_neg AS DOUBLE)/n_hi) * CAST(round(CAST(ln(CAST(hi_neg AS DOUBLE)/n_hi) AS DECIMAL(18,8)), 6) AS DOUBLE) END AS DECIMAL(18,8)), 6) AS DOUBLE)
      |    ) / 0.6931471805599453 AS DECIMAL(18,8)), 6) AS DOUBLE) AS h_hi,
      |    CAST(round(CAST((
      |      CAST(round(CAST(CASE WHEN lo_pos = 0 OR n_lo = 0 THEN 0.0
      |        ELSE -(CAST(lo_pos AS DOUBLE)/n_lo) * CAST(round(CAST(ln(CAST(lo_pos AS DOUBLE)/n_lo) AS DECIMAL(18,8)), 6) AS DOUBLE) END AS DECIMAL(18,8)), 6) AS DOUBLE)
      |      + CAST(round(CAST(CASE WHEN lo_neg = 0 OR n_lo = 0 THEN 0.0
      |        ELSE -(CAST(lo_neg AS DOUBLE)/n_lo) * CAST(round(CAST(ln(CAST(lo_neg AS DOUBLE)/n_lo) AS DECIMAL(18,8)), 6) AS DOUBLE) END AS DECIMAL(18,8)), 6) AS DOUBLE)
      |    ) / 0.6931471805599453 AS DECIMAL(18,8)), 6) AS DOUBLE) AS h_lo
      |  FROM e
      |), gains AS (
      |  SELECT thr_idx, n_hi, n_lo,
      |    CAST(round(CAST(h_parent - CAST(round(CAST(
      |      (CAST(n_hi AS DOUBLE)/n_all) * h_hi + (CAST(n_lo AS DOUBLE)/n_all) * h_lo
      |      AS DECIMAL(18,8)), 6) AS DOUBLE) AS DECIMAL(18,8)), 6) AS DOUBLE) AS gain_bits
      |  FROM macro_h
      |)
      |SELECT thr_idx, n_hi, n_lo, gain_bits,
      |  CAST(CASE WHEN gain_bits = max(gain_bits) OVER () THEN 1 ELSE 0 END AS INT) AS is_best
      |FROM gains ORDER BY thr_idx""".stripMargin

  // ---------------------------------------------------------------
  // Robust per-group means: 5% two-sided trim and winsorization of
  // event values per event type. Thresholds come from the exact
  // interpolated percentile (the rfm_segments parity discipline),
  // SNAPPED TO THE DATA'S OWN 4-dp GRAIN before they cut or clamp —
  // so the boundary comparison and the clamped values are exact in
  // both engines and downstream DECIMAL sums never re-round.
  //
  // Scale shape: one partial-agg pass for the thresholds (percentile
  // is a typed-agg reduction, not a sort), broadcast back, one more
  // pass for the three means. No global sort, no window over raw
  // events.
  private def trimmedMean(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(col("event_type"), col("value"))
    val thr = e.groupBy(col("event_type")).agg(
      rnd(expr("percentile(value, 0.05D)"), 4).as("lo"),
      rnd(expr("percentile(value, 0.95D)"), 4).as("hi"))
    e.join(broadcast(thr), Seq("event_type"))
      .withColumn("w", greatest(col("lo"), least(col("value"), col("hi"))))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        rnd(sum(dec(col("value"))).cast("double") / count(lit(1)), 4).as("mean_all"),
        max(col("lo")).as("p05"),
        max(col("hi")).as("p95"),
        sum(when(col("value") >= col("lo") && col("value") <= col("hi"), 1L)
          .otherwise(0L)).as("n_kept"),
        rnd(sum(when(col("value") >= col("lo") && col("value") <= col("hi"),
          dec(col("value"))).otherwise(lit(0).cast("decimal(18,4)"))).cast("double")
          / sum(when(col("value") >= col("lo") && col("value") <= col("hi"), 1L)
            .otherwise(0L)), 4).as("trimmed_mean"),
        rnd(sum(dec(col("w"))).cast("double") / count(lit(1)), 4).as("winsor_mean"))
      .select(col("event_type"), col("n"), col("mean_all"), col("p05"), col("p95"),
        col("n_kept"), col("trimmed_mean"), col("winsor_mean"))
      .orderBy(col("event_type"))
  }

  private val trimmedMeanSql =
    """WITH e AS (
      |  SELECT event_type, value FROM events
      |), thr AS (
      |  SELECT event_type,
      |    CAST(round(CAST(quantile_cont(value, 0.05) AS DECIMAL(18,8)), 4) AS DOUBLE) AS lo,
      |    CAST(round(CAST(quantile_cont(value, 0.95) AS DECIMAL(18,8)), 4) AS DOUBLE) AS hi
      |  FROM e GROUP BY 1
      |)
      |SELECT e.event_type,
      |  count(*) AS n,
      |  CAST(round(CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(*)
      |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS mean_all,
      |  any_value(lo) AS p05,
      |  any_value(hi) AS p95,
      |  CAST(sum(CASE WHEN value >= lo AND value <= hi THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(round(CAST(CAST(sum(CASE WHEN value >= lo AND value <= hi
      |      THEN CAST(value AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
      |    / sum(CASE WHEN value >= lo AND value <= hi THEN 1 ELSE 0 END)
      |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS trimmed_mean,
      |  CAST(round(CAST(CAST(sum(CAST(greatest(lo, least(value, hi)) AS DECIMAL(18,4))) AS DOUBLE)
      |    / count(*) AS DECIMAL(18,8)), 4) AS DOUBLE) AS winsor_mean
      |FROM e JOIN thr ON thr.event_type = e.event_type
      |GROUP BY e.event_type
      |ORDER BY e.event_type""".stripMargin

  // ---------------------------------------------------------------
  // Per-source OLS fit of quality score on log document length —
  // "does this source's quality degrade with length, and how fast?"
  // The regression-diagnostics primitive a curation gate runs per
  // crawl: slope/intercept from the closed-form normal equations, r²
  // for how much of the score variance length explains.
  //
  // Scale shape: ONE corpus pass reduces each source to five
  // sufficient statistics (Σx, Σy, Σxy, Σx², Σy² — all map-side
  // combinable DECIMAL sums); the fit itself is arithmetic on the
  // |sources|-row frame. Nothing after the first shuffle touches more
  // than |S| rows — the mi/ks reduction discipline.
  //
  // Determinism: x = ln(n_words) snaps to 6 dp (the psi/markov ln
  // discipline), y is the 3-dp quality score; every product snaps to
  // 8 dp before the exact DECIMAL sum, and the closed-form divisions
  // run on identical doubles in both engines. Degenerate sources
  // (zero length variance) report NULL slope/intercept/r2.
  private def olsDoclen(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.table(spark, dir, "documents")
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("n_stop", expr(
        "size(filter(ws, w -> w IN ('the','a','and','of','to','in')))").cast("long"))
      .withColumn("y", rnd(
        lit(0.5) * least(col("n_words").cast("double") / 100.0, lit(1.0)) +
          lit(0.5) * (lit(1.0) - rnd(col("n_stop").cast("double") / col("n_words"), 3)),
        3))
      .withColumn("x", rnd(log(col("n_words").cast("double")), 6))
    // products of the 6-dp x and 3-dp y carry up to 12 decimal digits;
    // snapping at any coarser scale lands on EXACT half-way points
    // where the two engines' double->decimal casts disagree (shortest
    // repr vs binary). At 12 dp every product is exactly representable
    // (the doubles sit ~1e-14 from the true decimal, half-way gap
    // 5e-13), so the sums are bit-identical by construction.
    def s12(c: Column): Column = sum(round(c.cast("decimal(18,12)"), 12)).cast("double")
    val stats = scored.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      s12(col("x")).as("sx"),
      s12(col("y")).as("sy"),
      s12(col("x") * col("y")).as("sxy"),
      s12(col("x") * col("x")).as("sxx"),
      s12(col("y") * col("y")).as("syy"))
    stats
      .withColumn("den", col("n_docs") * col("sxx") - col("sx") * col("sx"))
      .withColumn("num", col("n_docs") * col("sxy") - col("sx") * col("sy"))
      .withColumn("deny", col("n_docs") * col("syy") - col("sy") * col("sy"))
      .withColumn("slope", when(col("den") > 0, rnd(col("num") / col("den"), 6)))
      .withColumn("intercept",
        when(col("den") > 0, rnd((col("sy") - (col("num") / col("den")) * col("sx")) / col("n_docs"), 6)))
      .withColumn("r2", when(col("den") > 0 && col("deny") > 0,
        rnd(col("num") * col("num") / (col("den") * col("deny")), 6)))
      .select(col("source"), col("n_docs"), col("slope"), col("intercept"), col("r2"))
      .orderBy(col("source"))
  }

  private val olsDoclenSql =
    """WITH t AS (
      |  SELECT source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
      |    CAST(len(list_filter(string_split(text, ' '),
      |      w -> w IN ('the','a','and','of','to','in'))) AS BIGINT) AS n_stop
      |  FROM documents
      |), xy AS (
      |  SELECT source,
      |    CAST(round(CAST(ln(CAST(n_words AS DOUBLE)) AS DECIMAL(18,8)), 6) AS DOUBLE) AS x,
      |    CAST(round(CAST(0.5 * least(CAST(n_words AS DOUBLE) / 100.0, 1.0)
      |      + 0.5 * (1.0 - CAST(round(CAST(CAST(n_stop AS DOUBLE) / n_words AS DECIMAL(18,8)), 3) AS DOUBLE))
      |      AS DECIMAL(18,8)), 3) AS DOUBLE) AS y
      |  FROM t
      |), st AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(round(CAST(x AS DECIMAL(18,12)), 12)) AS DOUBLE) AS sx,
      |    CAST(sum(round(CAST(y AS DECIMAL(18,12)), 12)) AS DOUBLE) AS sy,
      |    CAST(sum(round(CAST(x * y AS DECIMAL(18,12)), 12)) AS DOUBLE) AS sxy,
      |    CAST(sum(round(CAST(x * x AS DECIMAL(18,12)), 12)) AS DOUBLE) AS sxx,
      |    CAST(sum(round(CAST(y * y AS DECIMAL(18,12)), 12)) AS DOUBLE) AS syy
      |  FROM xy GROUP BY source
      |), f AS (
      |  SELECT source, n_docs, sx, sy,
      |    n_docs * sxx - sx * sx AS den,
      |    n_docs * sxy - sx * sy AS num,
      |    n_docs * syy - sy * sy AS deny
      |  FROM st
      |)
      |SELECT source, n_docs,
      |  CASE WHEN den > 0 THEN CAST(round(CAST(num / den AS DECIMAL(18,8)), 6) AS DOUBLE) END AS slope,
      |  CASE WHEN den > 0 THEN CAST(round(CAST((sy - (num / den) * sx) / n_docs AS DECIMAL(18,8)), 6) AS DOUBLE) END AS intercept,
      |  CASE WHEN den > 0 AND deny > 0 THEN CAST(round(CAST(num * num / (den * deny) AS DECIMAL(18,8)), 6) AS DOUBLE) END AS r2
      |FROM f ORDER BY source""".stripMargin

  // ---------------------------------------------------------------
  // 1-D Wasserstein-1 (earth-mover) distance of the quality-score
  // distribution, each source vs the rest of the corpus — the
  // magnitude-aware companion of eval_ks_by_source: KS reports the
  // single worst CDF gap, W1 integrates |F_s - F_rest| over the score
  // axis, so a broad small shift (crawl-wide template rot) scores
  // high even when no single point gap is extreme. The standard
  // train/serve drift magnitude (same statistic PSI approximates in
  // bins).
  //
  // Scale shape: identical to the KS reduction — one corpus pass to
  // (source, score) counts (≤ |S|·1001 rows), the dense CDF grid is
  // a broadcast cross of two tiny reductions, and the integral is a
  // sum over that grid. Nothing after the first shuffle exceeds
  // |S|·1001 rows at any corpus size.
  //
  // Exactness: |F_s - F_rest| at each step is the integer
  // cross-multiplication |cum_s·n_rest - cum_rest·n_in|; the step
  // width is an exact DECIMAL(6,3) difference of adjacent 3-dp grid
  // points (the score's native grain, cast exactly). Each term is
  // integer × exact-decimal, summed in DECIMAL — division and the
  // 6-dp snap happen once, at the very end.
  private def wassersteinBySource(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.table(spark, dir, "documents")
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("n_stop", expr(
        "size(filter(ws, w -> w IN ('the','a','and','of','to','in')))").cast("long"))
      .withColumn("v", rnd(
        lit(0.5) * least(col("n_words").cast("double") / 100.0, lit(1.0)) +
          lit(0.5) * (lit(1.0) - rnd(col("n_stop").cast("double") / col("n_words"), 3)),
        3))
    val counts = scored.groupBy(col("source"), col("v")).agg(count(lit(1)).as("cnt"))
    val sources = counts.groupBy(col("source")).agg(sum(col("cnt")).as("n_in"))
    val grid = counts.select(col("v")).distinct()
    val perV = counts.groupBy(col("v")).agg(sum(col("cnt")).as("cnt_all"))
    val wAllByV = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumAll = perV.withColumn("cum_all", sum(col("cnt_all")).over(wAllByV))
      .select(col("v"), col("cum_all"))
    val wSrc = Window.partitionBy(col("source")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLead = Window.partitionBy(col("source")).orderBy(col("v"))
    val dense = sources.crossJoin(grid)
      .join(counts, Seq("source", "v"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .withColumn("cum_s", sum(col("cnt")).over(wSrc))
      .join(broadcast(cumAll), Seq("v"))
      .withColumn("n", max(col("cum_all")).over(Window.partitionBy()))
      .withColumn("n_rest", col("n") - col("n_in"))
      .withColumn("cum_rest", col("cum_all") - col("cum_s"))
      .withColumn("num", abs(col("cum_s") * col("n_rest") - col("cum_rest") * col("n_in")))
      .withColumn("vd", col("v").cast("decimal(6,3)"))
      .withColumn("gap", coalesce(
        lead(col("vd"), 1).over(wLead) - col("vd"), lit(0).cast("decimal(7,3)")))
      .withColumn("term", col("num").cast("decimal(18,0)") * col("gap"))
    dense.groupBy(col("source"))
      .agg(
        max(col("n_in")).as("n_in"),
        max(col("n_rest")).as("n_rest"),
        sum(col("term")).as("w1_num"))
      .withColumn("w1_dist",
        rnd(col("w1_num").cast("double") / (col("n_in") * col("n_rest")).cast("double"), 6))
      .select(col("source"), col("n_in"), col("n_rest"), col("w1_dist"))
      .orderBy(col("source"))
  }

  private val wassersteinBySourceSql =
    """WITH scored AS (
      |  SELECT source,
      |    CAST(round(CAST(0.5 * least(CAST(n_words AS DOUBLE) / 100.0, 1.0)
      |      + 0.5 * (1.0 - CAST(round(CAST(CAST(n_stop AS DOUBLE) / n_words AS DECIMAL(18,8)), 3) AS DOUBLE))
      |      AS DECIMAL(18,8)), 3) AS DOUBLE) AS v
      |  FROM (
      |    SELECT source,
      |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
      |      CAST(len(list_filter(string_split(text, ' '),
      |        w -> w IN ('the','a','and','of','to','in'))) AS BIGINT) AS n_stop
      |    FROM documents
      |  )
      |), counts AS (
      |  SELECT source, v, count(*) AS cnt FROM scored GROUP BY 1, 2
      |), sources AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_in FROM counts GROUP BY 1),
      |grid AS (SELECT DISTINCT v FROM counts),
      |cum_all AS (
      |  SELECT v, CAST(sum(cnt_all) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_all
      |  FROM (SELECT v, sum(cnt) AS cnt_all FROM counts GROUP BY 1)
      |), dense AS (
      |  SELECT s.source, g.v, s.n_in,
      |    CAST(sum(coalesce(c.cnt, 0)) OVER (PARTITION BY s.source ORDER BY g.v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_s,
      |    a.cum_all
      |  FROM sources s CROSS JOIN grid g
      |  LEFT JOIN counts c ON c.source = s.source AND c.v = g.v
      |  JOIN cum_all a ON a.v = g.v
      |), terms AS (
      |  SELECT source, n_in,
      |    (SELECT max(cum_all) FROM cum_all) - n_in AS n_rest,
      |    CAST(abs(cum_s * ((SELECT max(cum_all) FROM cum_all) - n_in)
      |      - (cum_all - cum_s) * n_in) AS DECIMAL(18,0))
      |    * coalesce(lead(CAST(v AS DECIMAL(6,3))) OVER (PARTITION BY source ORDER BY v)
      |        - CAST(v AS DECIMAL(6,3)), CAST(0 AS DECIMAL(7,3))) AS term
      |  FROM dense
      |)
      |SELECT source, n_in, any_value(n_rest) AS n_rest,
      |  CAST(round(CAST(CAST(sum(term) AS DOUBLE)
      |    / CAST(n_in * any_value(n_rest) AS DOUBLE) AS DECIMAL(18,8)), 6) AS DOUBLE) AS w1_dist
      |FROM terms GROUP BY source, n_in ORDER BY source""".stripMargin

  // ---------------------------------------------------------------
  // Split-conformal calibration of the quality score, per language —
  // the distribution-free prediction-interval machinery (Vovk et al.;
  // Angelopoulos & Bates 2021 tutorial form): on the VAL slice of the
  // pipeline_split_assign hash split, the threshold q̂ is the
  // k-th smallest calibration score with k = ⌈(1-α)(n_cal+1)⌉
  // (α = 0.2); the finite-sample guarantee says a fresh doc's score
  // is ≤ q̂ with probability ≥ 1-α — audited here as empirical
  // coverage on the disjoint TEST slice. The conformal form of "what
  // score cutoff can this gate promise, with what confidence" — run
  // before shipping any score threshold downstream. k > n_cal (too
  // little calibration data for the guarantee) reports NULL, not a
  // made-up cutoff.
  //
  // Scale shape: scores live on the 3-dp grid, so the k-th order
  // statistic needs NO per-language sort of raw rows — one corpus
  // pass reduces the val slice to the (lang, score) level table
  // (≤ |L|·1001 rows), the cumulative window runs there, and q̂ is
  // the min level with cum ≥ k (the pipeline_budget_select trick).
  // The test-slice audit is one more partial-agg pass against the
  // broadcast |L|-row threshold frame.
  //
  // Determinism: k is pure integer arithmetic, the order statistic
  // is a DISCRETE rank on exact counts (never an interpolated
  // percentile), and v ≤ q̂ compares two identically-snapped 3-dp
  // doubles — exact in both engines.
  private def conformalThreshold(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.table(spark, dir, "documents")
      .withColumn("bucket",
        expr("cast(conv(substring(md5(cast(doc_id AS string)), 1, 8), 16, 10) AS bigint) % 100"))
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("n_stop", expr(
        "size(filter(ws, w -> w IN ('the','a','and','of','to','in')))").cast("long"))
      .withColumn("v", rnd(
        lit(0.5) * least(col("n_words").cast("double") / 100.0, lit(1.0)) +
          lit(0.5) * (lit(1.0) - rnd(col("n_stop").cast("double") / col("n_words"), 3)),
        3))
      .select(col("lang"), col("bucket"), col("v"))
    val cal = scored.where(col("bucket") >= 90 && col("bucket") < 95)
    val tst = scored.where(col("bucket") >= 95)
    val nc = cal.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_cal"))
      .withColumn("k", expr("(8 * n_cal + 16) div 10"))
    val wCum = Window.partitionBy(col("lang")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lvl = cal.groupBy(col("lang"), col("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wCum))
    val qh = lvl.join(broadcast(nc), "lang")
      .where(col("cum") >= col("k"))
      .groupBy(col("lang")).agg(min(col("v")).as("qhat"))
    val ts = tst.join(broadcast(qh), Seq("lang"), "left")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("qhat").isNotNull && col("v") <= col("qhat"), 1L).otherwise(0L))
          .as("n_cov"))
    nc.join(qh, Seq("lang"), "left")
      .join(ts, Seq("lang"), "left")
      .select(col("lang"), col("n_cal"),
        coalesce(col("n_test"), lit(0L)).as("n_test"), col("k"), col("qhat"),
        when(col("qhat").isNotNull && col("n_test") > 0,
          rnd(col("n_cov").cast("double") / col("n_test"), 6)).as("coverage"))
      .orderBy(col("lang"))
  }

  private val conformalThresholdSql =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bucket,
      |    CAST(round(CAST(0.5 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
      |      + 0.5 * (1.0 - CAST(round(CAST(CAST(len(list_filter(string_split(text, ' '),
      |        w -> w IN ('the','a','and','of','to','in'))) AS DOUBLE)
      |        / len(string_split(text, ' ')) AS DECIMAL(18,8)), 3) AS DOUBLE))
      |      AS DECIMAL(18,8)), 3) AS DOUBLE) AS v
      |  FROM documents
      |), cal AS (SELECT lang, v FROM t WHERE bucket >= 90 AND bucket < 95),
      |tst AS (SELECT lang, v FROM t WHERE bucket >= 95),
      |nc AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_cal,
      |  (8 * count(*) + 16) // 10 AS k FROM cal GROUP BY 1),
      |lvl AS (
      |  SELECT lang, v, CAST(sum(count(*)) OVER (PARTITION BY lang ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM cal GROUP BY lang, v
      |), qh AS (
      |  SELECT l.lang, min(l.v) AS qhat FROM lvl l JOIN nc ON nc.lang = l.lang
      |  WHERE l.cum >= nc.k GROUP BY 1
      |), ts AS (
      |  SELECT t2.lang, CAST(count(*) AS BIGINT) AS n_test,
      |    CAST(sum(CASE WHEN qh.qhat IS NOT NULL AND t2.v <= qh.qhat THEN 1 ELSE 0 END) AS BIGINT) AS n_cov
      |  FROM tst t2 LEFT JOIN qh ON qh.lang = t2.lang GROUP BY 1
      |)
      |SELECT nc.lang, nc.n_cal, coalesce(ts.n_test, 0) AS n_test, nc.k, qh.qhat,
      |  CASE WHEN qh.qhat IS NOT NULL AND ts.n_test > 0
      |    THEN CAST(round(CAST(CAST(ts.n_cov AS DOUBLE) / ts.n_test AS DECIMAL(18,8)), 6) AS DOUBLE) END AS coverage
      |FROM nc LEFT JOIN qh ON qh.lang = nc.lang LEFT JOIN ts ON ts.lang = nc.lang
      |ORDER BY nc.lang""".stripMargin

  // ---------------------------------------------------------------
  // CUPED A/B readout (Deng et al., WSDM 2013): the experiment
  // analysis every growth platform runs. Users hash-split into two
  // arms (md5 parity — deterministic, no RNG); the metric Y is each
  // user's POST-period value sum, the covariate X the PRE-period sum
  // (boundary = series midpoint). CUPED subtracts θ·(X - X̄) with
  // θ = cov(X,Y)/var(X) pooled, shrinking metric variance by ρ² —
  // the same experiment decides significance with far fewer users.
  // Output: both arms' sizes and means, the raw and CUPED-adjusted
  // lifts with their z-scores, θ, and the realized variance
  // reduction ρ².
  //
  // Scale shape: ONE user_id exchange builds per-user (X, Y); ONE
  // |arms|-key partial aggregation reduces them to 6 sufficient
  // statistics per arm (all map-side combinable DECIMAL sums of
  // exact decimal products); every statistic after is arithmetic on
  // a 2-row frame. Nothing beyond per-user rows ever shuffles.
  //
  // Determinism: X and Y are DECIMAL(18,4) sums; squares and cross
  // products are exact decimals, so the sufficient statistics are
  // bit-identical in both engines; θ snaps at 6 BEFORE it enters the
  // adjusted lift and variances (the lr-step quantized-coefficient
  // discipline), and each reported double snaps once at the end.
  private def abCuped(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).withColumn("sec", col("ts").cast("long"))
    val bound = e.agg(((min(col("sec")) + max(col("sec"))) / 2).cast("long").as("mid"))
    val perUser = e.crossJoin(broadcast(bound))
      .withColumn("arm",
        expr("cast(conv(substring(md5(cast(user_id AS string)), 1, 8), 16, 10) AS bigint) % 2"))
      .groupBy(col("user_id"), col("arm"))
      .agg(
        // per-user sums re-narrow to (18,4) so the squares/cross
        // products stay inside exact 38-digit decimals in both engines
        sum(when(col("sec") < col("mid"), dec(col("value")))
          .otherwise(lit(0).cast("decimal(18,4)"))).cast("decimal(18,4)").as("x"),
        sum(when(col("sec") >= col("mid"), dec(col("value")))
          .otherwise(lit(0).cast("decimal(18,4)"))).cast("decimal(18,4)").as("y"))
    val arms = perUser.groupBy(col("arm"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    def arm(c: String, a: Int): Column = max(when(col("arm") === a, col(c)))
    val wide = arms.agg(
      arm("n", 0).as("n_a"), arm("n", 1).as("n_b"),
      arm("sx", 0).cast("double").as("sxa"), arm("sx", 1).cast("double").as("sxb"),
      arm("sy", 0).cast("double").as("sya"), arm("sy", 1).cast("double").as("syb"),
      arm("sxx", 0).cast("double").as("sxxa"), arm("sxx", 1).cast("double").as("sxxb"),
      arm("syy", 0).cast("double").as("syya"), arm("syy", 1).cast("double").as("syyb"),
      arm("sxy", 0).cast("double").as("sxya"), arm("sxy", 1).cast("double").as("sxyb"))
    wide
      .withColumn("nn", (col("n_a") + col("n_b")).cast("double"))
      .withColumn("sxp", col("sxa") + col("sxb"))
      .withColumn("syp", col("sya") + col("syb"))
      .withColumn("covp",
        ((col("sxya") + col("sxyb")) - col("sxp") * col("syp") / col("nn")) / col("nn"))
      .withColumn("varxp",
        ((col("sxxa") + col("sxxb")) - col("sxp") * col("sxp") / col("nn")) / col("nn"))
      .withColumn("varyp",
        ((col("syya") + col("syyb")) - col("syp") * col("syp") / col("nn")) / col("nn"))
      .withColumn("theta", when(col("varxp") > 0, rnd(col("covp") / col("varxp"), 6)))
      .withColumn("mya", col("sya") / col("n_a"))
      .withColumn("myb", col("syb") / col("n_b"))
      .withColumn("vya", col("syya") / col("n_a") - col("mya") * col("mya"))
      .withColumn("vyb", col("syyb") / col("n_b") - col("myb") * col("myb"))
      .withColumn("cva",
        col("sxya") / col("n_a") - (col("sxa") / col("n_a")) * col("mya"))
      .withColumn("cvb",
        col("sxyb") / col("n_b") - (col("sxb") / col("n_b")) * col("myb"))
      .withColumn("vxa",
        col("sxxa") / col("n_a") - (col("sxa") / col("n_a")) * (col("sxa") / col("n_a")))
      .withColumn("vxb",
        col("sxxb") / col("n_b") - (col("sxb") / col("n_b")) * (col("sxb") / col("n_b")))
      .withColumn("vca",
        col("vya") - lit(2.0) * col("theta") * col("cva") + col("theta") * col("theta") * col("vxa"))
      .withColumn("vcb",
        col("vyb") - lit(2.0) * col("theta") * col("cvb") + col("theta") * col("theta") * col("vxb"))
      .withColumn("diff_raw", col("myb") - col("mya"))
      .withColumn("diff_cuped",
        col("diff_raw") - col("theta") * (col("sxb") / col("n_b") - col("sxa") / col("n_a")))
      .withColumn("se_raw", sqrt(col("vya") / col("n_a") + col("vyb") / col("n_b")))
      .withColumn("se_cuped", sqrt(col("vca") / col("n_a") + col("vcb") / col("n_b")))
      .select(
        col("n_a"), col("n_b"),
        rnd(col("mya"), 6).as("mean_y_a"),
        rnd(col("myb"), 6).as("mean_y_b"),
        rnd(col("diff_raw"), 6).as("diff_raw"),
        col("theta"),
        when(col("varxp") > 0 && col("varyp") > 0,
          rnd(col("covp") * col("covp") / (col("varxp") * col("varyp")), 6))
          .as("var_reduction"),
        when(col("se_raw") > 0, rnd(col("diff_raw") / col("se_raw"), 4)).as("z_raw"),
        when(col("se_cuped") > 0, rnd(col("diff_cuped") / col("se_cuped"), 4)).as("z_cuped"))
  }

  private val abCupedSql =
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts)//1000000000 AS sec, value FROM events
      |), bound AS (
      |  SELECT (min(sec) + max(sec)) // 2 AS mid FROM e
      |), pu AS (
      |  SELECT user_id,
      |    ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS arm,
      |    CAST(sum(CASE WHEN sec < mid THEN CAST(value AS DECIMAL(18,4))
      |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS x,
      |    CAST(sum(CASE WHEN sec >= mid THEN CAST(value AS DECIMAL(18,4))
      |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS y
      |  FROM e, bound GROUP BY 1, 2
      |), arms AS (
      |  SELECT arm, CAST(count(*) AS BIGINT) AS n,
      |    sum(x) AS sx, sum(y) AS sy,
      |    sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      |  FROM pu GROUP BY 1
      |), w AS (
      |  SELECT
      |    max(CASE WHEN arm = 0 THEN n END) AS n_a, max(CASE WHEN arm = 1 THEN n END) AS n_b,
      |    CAST(max(CASE WHEN arm = 0 THEN sx END) AS DOUBLE) AS sxa, CAST(max(CASE WHEN arm = 1 THEN sx END) AS DOUBLE) AS sxb,
      |    CAST(max(CASE WHEN arm = 0 THEN sy END) AS DOUBLE) AS sya, CAST(max(CASE WHEN arm = 1 THEN sy END) AS DOUBLE) AS syb,
      |    CAST(max(CASE WHEN arm = 0 THEN sxx END) AS DOUBLE) AS sxxa, CAST(max(CASE WHEN arm = 1 THEN sxx END) AS DOUBLE) AS sxxb,
      |    CAST(max(CASE WHEN arm = 0 THEN syy END) AS DOUBLE) AS syya, CAST(max(CASE WHEN arm = 1 THEN syy END) AS DOUBLE) AS syyb,
      |    CAST(max(CASE WHEN arm = 0 THEN sxy END) AS DOUBLE) AS sxya, CAST(max(CASE WHEN arm = 1 THEN sxy END) AS DOUBLE) AS sxyb
      |  FROM arms
      |), d AS (
      |  SELECT *,
      |    CAST(n_a + n_b AS DOUBLE) AS nn,
      |    sxa + sxb AS sxp, sya + syb AS syp
      |  FROM w
      |), d2 AS (
      |  SELECT *,
      |    ((sxya + sxyb) - sxp * syp / nn) / nn AS covp,
      |    ((sxxa + sxxb) - sxp * sxp / nn) / nn AS varxp,
      |    ((syya + syyb) - syp * syp / nn) / nn AS varyp,
      |    sya / n_a AS mya, syb / n_b AS myb
      |  FROM d
      |), d3 AS (
      |  SELECT *,
      |    CASE WHEN varxp > 0 THEN CAST(round(CAST(covp / varxp AS DECIMAL(18,8)), 6) AS DOUBLE) END AS theta,
      |    syya / n_a - mya * mya AS vya,
      |    syyb / n_b - myb * myb AS vyb,
      |    sxya / n_a - (sxa / n_a) * mya AS cva,
      |    sxyb / n_b - (sxb / n_b) * myb AS cvb,
      |    sxxa / n_a - (sxa / n_a) * (sxa / n_a) AS vxa,
      |    sxxb / n_b - (sxb / n_b) * (sxb / n_b) AS vxb,
      |    myb - mya AS diff_raw
      |  FROM d2
      |), d4 AS (
      |  SELECT *,
      |    vya - 2.0 * theta * cva + theta * theta * vxa AS vca,
      |    vyb - 2.0 * theta * cvb + theta * theta * vxb AS vcb,
      |    diff_raw - theta * (sxb / n_b - sxa / n_a) AS diff_cuped
      |  FROM d3
      |), d5 AS (
      |  SELECT *,
      |    sqrt(vya / n_a + vyb / n_b) AS se_raw,
      |    sqrt(vca / n_a + vcb / n_b) AS se_cuped
      |  FROM d4
      |)
      |SELECT n_a, n_b,
      |  CAST(round(CAST(mya AS DECIMAL(18,8)), 6) AS DOUBLE) AS mean_y_a,
      |  CAST(round(CAST(myb AS DECIMAL(18,8)), 6) AS DOUBLE) AS mean_y_b,
      |  CAST(round(CAST(diff_raw AS DECIMAL(18,8)), 6) AS DOUBLE) AS diff_raw,
      |  theta,
      |  CASE WHEN varxp > 0 AND varyp > 0
      |    THEN CAST(round(CAST(covp * covp / (varxp * varyp) AS DECIMAL(18,8)), 6) AS DOUBLE) END AS var_reduction,
      |  CASE WHEN se_raw > 0
      |    THEN CAST(round(CAST(diff_raw / se_raw AS DECIMAL(18,8)), 4) AS DOUBLE) END AS z_raw,
      |  CASE WHEN se_cuped > 0
      |    THEN CAST(round(CAST(diff_cuped / se_cuped AS DECIMAL(18,8)), 4) AS DOUBLE) END AS z_cuped
      |FROM d5""".stripMargin

  // ---------------------------------------------------------------
  // KMV (k-minimum-values) distinct sketches with SET OPERATIONS —
  // the sketch family approx_count_distinct (HLL) can't do: two KMV
  // sketches merge by keeping the k smallest of the union, and the
  // merged sketch answers |A ∪ B| via (k-1)/u_k and |A ∩ B| via the
  // Beyer et al. (SIGMOD 2007) ρ·û estimator, where ρ is the
  // fraction of the merged sketch present in both inputs. Run per
  // event-type pair over distinct users, every estimate printed NEXT
  // TO its exact value — the sketch-accuracy audit, and exact below
  // capacity by construction (a half-full sketch IS the set).
  //
  // Scale shape: one distinct reduction of (type, user), a hash per
  // user, and the per-type k-smallest via a rank window that
  // rewrites to WindowGroupLimit (the source_cap pattern) — at most
  // k rows per type survive, so the pair construction is
  // |types|²·k rows of driver-free arithmetic. The exact twin
  // reduces per-user type sets (≤ |types| each) to i<j pair counts.
  // Nothing after the two corpus reductions exceeds |types|²·k rows.
  //
  // Determinism: hashes are exact 60-bit integers (md5 prefix), rank
  // and membership are integer, u_k floats once per pair and each
  // estimate snaps at its reporting scale.
  private val kmvK = 64

  private def kmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    val two60 = 1152921504606846976L // 2^60
    // element = daily-active (user, day) identity — types share users
    // wholesale in the fixture, but not user-DAYS, so the pairwise
    // set structure is non-trivial at every SF
    val tu = Tables.events(spark, dir)
      .withColumn("sec", col("ts").cast("long"))
      .select(col("event_type"),
        concat(col("user_id").cast("string"), lit(":"),
          expr("sec div 86400").cast("string")).as("elem"))
      .distinct()
      .withColumn("h", expr(
        "cast(conv(substring(md5(elem), 1, 15), 16, 10) AS bigint)"))
    val wT = Window.partitionBy(col("event_type")).orderBy(col("h"))
    // pin the sketch: ≤ |types|·k rows, consumed by perType, the merged
    // pair build AND the type universe — left lazy, the corpus distinct
    // + rank-window chain re-plans once per consumer (the before-plan
    // carried it 145 operators deep; guide §5 localCheckpoint)
    val sk = tu.select(col("event_type"), col("h")).distinct()
      .withColumn("rk", row_number().over(wT)).where(col("rk") <= kmvK)
      .localCheckpoint()
    def estOf(cnt: Column, hk: Column): Column =
      when(cnt < kmvK, cnt.cast("double"))
        .otherwise(lit((kmvK - 1).toDouble) / (hk.cast("double") / two60))
    val perType = sk.groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), max(col("h")).as("hk"))
      .select(col("event_type"), rnd(estOf(col("cnt"), col("hk")), 2).as("n_est"))
    val exact = tu.groupBy(col("event_type")).agg(count(lit(1)).as("n_exact"))
    val typeSets = tu.groupBy(col("elem"))
      .agg(sort_array(collect_set(col("event_type"))).as("ts"))
    val exactPairs = typeSets
      .select(col("ts"), posexplode(col("ts")).as(Seq("i", "ta")))
      .select(col("ta"), explode(expr("slice(ts, i + 2, size(ts))")).as("tb"))
      .groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("inter_exact"))
    val types = sk.select(col("event_type")).distinct()
    val tpairs = types.as("x").join(types.as("y"),
        col("x.event_type") < col("y.event_type"))
      .select(col("x.event_type").as("ta"), col("y.event_type").as("tb"))
    val merged = broadcast(tpairs)
      .join(sk, col("event_type") === col("ta") || col("event_type") === col("tb"))
      .groupBy(col("ta"), col("tb"), col("h"))
      .agg(max(when(col("event_type") === col("ta"), 1L).otherwise(0L)).as("in_a"),
        max(when(col("event_type") === col("tb"), 1L).otherwise(0L)).as("in_b"))
    val wP = Window.partitionBy(col("ta"), col("tb")).orderBy(col("h"))
    val est = merged.withColumn("rk", row_number().over(wP)).where(col("rk") <= kmvK)
      .groupBy(col("ta"), col("tb"))
      .agg(count(lit(1)).as("m"), max(col("h")).as("hk"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L)).as("both"))
      .withColumn("union_est_raw", estOf(col("m"), col("hk")))
      .withColumn("rho", col("both").cast("double") / col("m"))
    est
      .join(broadcast(exact.select(col("event_type").as("ta"), col("n_exact").as("n_exact_a"))), "ta")
      .join(broadcast(exact.select(col("event_type").as("tb"), col("n_exact").as("n_exact_b"))), "tb")
      .join(broadcast(exactPairs), Seq("ta", "tb"), "left")
      .join(broadcast(perType.select(col("event_type").as("ta"), col("n_est").as("n_est_a"))), "ta")
      .join(broadcast(perType.select(col("event_type").as("tb"), col("n_est").as("n_est_b"))), "tb")
      .withColumn("inter_exact", coalesce(col("inter_exact"), lit(0L)))
      .withColumn("union_exact", col("n_exact_a") + col("n_exact_b") - col("inter_exact"))
      .select(col("ta"), col("tb"),
        col("n_exact_a"), col("n_est_a"), col("n_exact_b"), col("n_est_b"),
        col("union_exact"), rnd(col("union_est_raw"), 2).as("union_est"),
        col("inter_exact"), rnd(col("rho") * col("union_est_raw"), 2).as("inter_est"),
        rnd(col("inter_exact").cast("double") / col("union_exact"), 4).as("jaccard_exact"),
        rnd(col("rho"), 4).as("jaccard_est"))
      .orderBy(col("ta"), col("tb"))
  }

  private lazy val kmvDistinctSql = {
    val k = kmvK
    s"""WITH tu AS (
       |  SELECT DISTINCT event_type,
       |    CAST(user_id AS VARCHAR) || ':' || CAST(epoch_ns(ts)//1000000000//86400 AS VARCHAR) AS elem
       |  FROM events
       |), h AS (
       |  SELECT event_type,
       |    ('0x' || substring(md5(elem), 1, 15))::BIGINT AS h
       |  FROM tu
       |), sk AS (
       |  SELECT event_type, h FROM (
       |    SELECT DISTINCT event_type, h FROM h
       |  ) t QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY h) <= $k
       |), pertype AS (
       |  SELECT event_type,
       |    CAST(round(CAST(CASE WHEN count(*) < $k THEN CAST(count(*) AS DOUBLE)
       |      ELSE ${(k - 1).toDouble} / (CAST(max(h) AS DOUBLE) / 1152921504606846976)
       |      END AS DECIMAL(18,8)), 2) AS DOUBLE) AS n_est
       |  FROM sk GROUP BY 1
       |), exact AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact FROM tu GROUP BY 1
       |), epairs AS (
       |  SELECT a.event_type AS ta, b.event_type AS tb, CAST(count(*) AS BIGINT) AS inter_exact
       |  FROM tu a JOIN tu b ON a.elem = b.elem AND a.event_type < b.event_type
       |  GROUP BY 1, 2
       |), tp AS (
       |  SELECT x.event_type AS ta, y.event_type AS tb
       |  FROM (SELECT DISTINCT event_type FROM sk) x
       |  JOIN (SELECT DISTINCT event_type FROM sk) y ON x.event_type < y.event_type
       |), merged AS (
       |  SELECT tp.ta, tp.tb, s.h,
       |    max(CASE WHEN s.event_type = tp.ta THEN 1 ELSE 0 END) AS in_a,
       |    max(CASE WHEN s.event_type = tp.tb THEN 1 ELSE 0 END) AS in_b
       |  FROM tp JOIN sk s ON s.event_type = tp.ta OR s.event_type = tp.tb
       |  GROUP BY 1, 2, 3
       |), mk AS (
       |  SELECT * FROM merged
       |  QUALIFY row_number() OVER (PARTITION BY ta, tb ORDER BY h) <= $k
       |), est AS (
       |  SELECT ta, tb, CAST(count(*) AS BIGINT) AS m, max(h) AS hk,
       |    CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_both
       |  FROM mk GROUP BY 1, 2
       |), e2 AS (
       |  SELECT ta, tb, m, n_both,
       |    CASE WHEN m < $k THEN CAST(m AS DOUBLE)
       |      ELSE ${(k - 1).toDouble} / (CAST(hk AS DOUBLE) / 1152921504606846976) END AS union_est_raw,
       |    CAST(n_both AS DOUBLE) / m AS rho
       |  FROM est
       |)
       |SELECT e2.ta, e2.tb,
       |  ea.n_exact AS n_exact_a, pa.n_est AS n_est_a,
       |  eb.n_exact AS n_exact_b, pb.n_est AS n_est_b,
       |  ea.n_exact + eb.n_exact - coalesce(ep.inter_exact, 0) AS union_exact,
       |  CAST(round(CAST(union_est_raw AS DECIMAL(18,8)), 2) AS DOUBLE) AS union_est,
       |  coalesce(ep.inter_exact, 0) AS inter_exact,
       |  CAST(round(CAST(rho * union_est_raw AS DECIMAL(18,8)), 2) AS DOUBLE) AS inter_est,
       |  CAST(round(CAST(CAST(coalesce(ep.inter_exact, 0) AS DOUBLE)
       |    / (ea.n_exact + eb.n_exact - coalesce(ep.inter_exact, 0)) AS DECIMAL(18,8)), 4) AS DOUBLE) AS jaccard_exact,
       |  CAST(round(CAST(rho AS DECIMAL(18,8)), 4) AS DOUBLE) AS jaccard_est
       |FROM e2
       |JOIN exact ea ON ea.event_type = e2.ta
       |JOIN exact eb ON eb.event_type = e2.tb
       |LEFT JOIN epairs ep ON ep.ta = e2.ta AND ep.tb = e2.tb
       |JOIN pertype pa ON pa.event_type = e2.ta
       |JOIN pertype pb ON pb.event_type = e2.tb
       |ORDER BY e2.ta, e2.tb""".stripMargin
  }

  // ---------------------------------------------------------------
  // Benford's-law audit of order totals — the forensic data-quality
  // screen (Nigrini's fraud/fabrication test): naturally-occurring
  // multi-scale amounts follow P(d) = log₁₀(1 + 1/d) for the leading
  // digit; synthetic, capped, or hand-entered values don't. Reports
  // the per-digit observed vs expected distribution with the χ² and
  // MAD conformity statistics (the two Nigrini thresholds).
  //
  // Scale shape: one corpus pass reduces to 9 digit counts
  // (map-side combinable); everything after is 9-row arithmetic.
  //
  // Determinism: the leading digit comes from the INTEGER cents
  // (price cast to DECIMAL(18,2) — exact — then scaled), never from
  // double formatting or log₁₀ of a float; expected probabilities
  // snap at 6, each χ² term at 6, terms DECIMAL-sum.
  private def auditBenford(spark: SparkSession, dir: String): DataFrame = {
    val digits = Tables.table(spark, dir, "orders")
      .withColumn("cents",
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .withColumn("d", substring(col("cents").cast("string"), 1, 1).cast("int"))
      .groupBy(col("d")).agg(count(lit(1)).as("n_d"))
    val spine = spark.range(1, 10).select(col("id").cast("int").as("d"))
    val wAll = Window.partitionBy()
    spine.join(digits, Seq("d"), "left")
      .withColumn("n_d", coalesce(col("n_d"), lit(0L)))
      .withColumn("n", sum(col("n_d")).over(wAll))
      .withColumn("frac", rnd(col("n_d").cast("double") / col("n"), 6))
      .withColumn("expected", rnd(log(10.0, lit(1.0) + lit(1.0) / col("d")), 6))
      .withColumn("chi_term", round(
        (pow(col("n_d").cast("double") - col("expected") * col("n"), 2.0)
          / (col("expected") * col("n"))).cast("decimal(18,8)"), 6))
      .withColumn("mad_term", round(
        abs(col("frac") - col("expected")).cast("decimal(18,8)"), 6))
      .withColumn("chi2", rnd(sum(col("chi_term")).over(wAll).cast("double"), 4))
      .withColumn("mad", rnd(sum(col("mad_term")).over(wAll).cast("double") / 9.0, 6))
      .select(col("d"), col("n_d"), col("frac"), col("expected"),
        col("chi2"), col("mad"))
      .orderBy(col("d"))
  }

  private val auditBenfordSql =
    """WITH digits AS (
      |  SELECT CAST(substring(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS VARCHAR), 1, 1) AS INTEGER) AS d,
      |    count(*) AS n_d
      |  FROM orders GROUP BY 1
      |), spine AS (SELECT unnest(range(1, 10)) AS d),
      |t AS (
      |  SELECT sp.d, coalesce(g.n_d, 0) AS n_d,
      |    sum(coalesce(g.n_d, 0)) OVER () AS n,
      |    CAST(round(CAST(ln(1.0 + 1.0 / sp.d) / ln(10.0) AS DECIMAL(18,8)), 6) AS DOUBLE) AS expected
      |  FROM spine sp LEFT JOIN digits g ON g.d = sp.d
      |), u AS (
      |  SELECT d, n_d, n, expected,
      |    CAST(round(CAST(CAST(n_d AS DOUBLE) / n AS DECIMAL(18,8)), 6) AS DOUBLE) AS frac,
      |    round(CAST(pow(CAST(n_d AS DOUBLE) - expected * n, 2.0) / (expected * n)
      |      AS DECIMAL(18,8)), 6) AS chi_term
      |  FROM t
      |), v AS (
      |  SELECT d, n_d, frac, expected,
      |    round(CAST(abs(frac - expected) AS DECIMAL(18,8)), 6) AS mad_term,
      |    chi_term
      |  FROM u
      |)
      |SELECT d, n_d, frac, expected,
      |  CAST(round(CAST(CAST(sum(chi_term) OVER () AS DOUBLE) AS DECIMAL(18,8)), 4) AS DOUBLE) AS chi2,
      |  CAST(round(CAST(CAST(sum(mad_term) OVER () AS DOUBLE) / 9.0 AS DECIMAL(18,8)), 6) AS DOUBLE) AS mad
      |FROM v ORDER BY d""".stripMargin

  // ---------------------------------------------------------------
  // Column-profile audit of the events table — the Deequ/profiling
  // primitive every ingestion gate runs before trusting a feed:
  // per-column row count, null count, and EXACT distinct
  // cardinality, computed in ONE pass via Spark's multi-distinct
  // Expand plan (no per-column rescans), then unpivoted row-locally
  // into the per-column report.
  //
  // Scale shape: the Expand multiplies rows by the distinct-column
  // count before the shuffle — the price of exactness; at 100 TB the
  // swap is approx_count_distinct (one HLL per column, no Expand —
  // the agg_approx_sketches machinery). Numeric ranges ride the same
  // pass as plain min/max partials.
  //
  // Determinism: counts and integer ranges are exact; the value
  // range reports the DECIMAL(18,4)-snapped bounds (the dec
  // discipline) so no raw double crosses the report.
  private def auditProfile(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).withColumn("sec", col("ts").cast("long"))
    val a = e.agg(
      count(lit(1)).as("n"),
      countDistinct(col("event_id")).as("d_event_id"),
      countDistinct(col("user_id")).as("d_user_id"),
      countDistinct(col("event_type")).as("d_event_type"),
      countDistinct(col("value")).as("d_value"),
      countDistinct(col("props")).as("d_props"),
      countDistinct(col("sec")).as("d_sec"),
      sum(when(col("event_id").isNull, 1L).otherwise(0L)).as("x_event_id"),
      sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("x_user_id"),
      sum(when(col("event_type").isNull, 1L).otherwise(0L)).as("x_event_type"),
      sum(when(col("value").isNull, 1L).otherwise(0L)).as("x_value"),
      sum(when(col("props").isNull, 1L).otherwise(0L)).as("x_props"),
      sum(when(col("sec").isNull, 1L).otherwise(0L)).as("x_sec"),
      min(col("event_id")).cast("double").as("mn_event_id"),
      max(col("event_id")).cast("double").as("mx_event_id"),
      min(col("user_id")).cast("double").as("mn_user_id"),
      max(col("user_id")).cast("double").as("mx_user_id"),
      min(dec(col("value"))).cast("double").as("mn_value"),
      max(dec(col("value"))).cast("double").as("mx_value"),
      min(col("sec")).cast("double").as("mn_sec"),
      max(col("sec")).cast("double").as("mx_sec"))
    def row(name: String): Column = struct(
      lit(name).as("column_name"),
      col(s"d_$name").as("n_distinct"),
      col(s"x_$name").as("n_null"),
      (if (Set("event_id", "user_id", "value", "sec")(name)) col(s"mn_$name")
       else lit(null).cast("double")).as("min_num"),
      (if (Set("event_id", "user_id", "value", "sec")(name)) col(s"mx_$name")
       else lit(null).cast("double")).as("max_num"))
    a.select(col("n"), explode(array(
        row("event_id"), row("user_id"), row("event_type"),
        row("value"), row("props"), row("sec"))).as("r"))
      .select(col("r.column_name"), col("n"), col("r.n_distinct"),
        col("r.n_null"), col("r.min_num"), col("r.max_num"))
      .orderBy(col("column_name"))
  }

  private val auditProfileSql =
    """WITH a AS (
      |  SELECT count(*) AS n,
      |    count(DISTINCT event_id) AS d_event_id,
      |    count(DISTINCT user_id) AS d_user_id,
      |    count(DISTINCT event_type) AS d_event_type,
      |    count(DISTINCT value) AS d_value,
      |    count(DISTINCT props) AS d_props,
      |    count(DISTINCT epoch_ns(ts)//1000000000) AS d_sec,
      |    CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS x_event_id,
      |    CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS x_user_id,
      |    CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS x_event_type,
      |    CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS x_value,
      |    CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS x_props,
      |    CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS x_sec,
      |    CAST(min(event_id) AS DOUBLE) AS mn_event_id, CAST(max(event_id) AS DOUBLE) AS mx_event_id,
      |    CAST(min(user_id) AS DOUBLE) AS mn_user_id, CAST(max(user_id) AS DOUBLE) AS mx_user_id,
      |    CAST(min(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS mn_value,
      |    CAST(max(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS mx_value,
      |    CAST(min(epoch_ns(ts)//1000000000) AS DOUBLE) AS mn_sec,
      |    CAST(max(epoch_ns(ts)//1000000000) AS DOUBLE) AS mx_sec
      |  FROM events
      |)
      |SELECT column_name, n, n_distinct, n_null, min_num, max_num FROM (
      |  SELECT 'event_id' AS column_name, n, CAST(d_event_id AS BIGINT) AS n_distinct,
      |    CAST(x_event_id AS BIGINT) AS n_null, mn_event_id AS min_num, mx_event_id AS max_num FROM a
      |  UNION ALL SELECT 'user_id', n, d_user_id, x_user_id, mn_user_id, mx_user_id FROM a
      |  UNION ALL SELECT 'event_type', n, d_event_type, x_event_type, NULL, NULL FROM a
      |  UNION ALL SELECT 'value', n, d_value, x_value, mn_value, mx_value FROM a
      |  UNION ALL SELECT 'props', n, d_props, x_props, NULL, NULL FROM a
      |  UNION ALL SELECT 'sec', n, d_sec, x_sec, mn_sec, mx_sec FROM a
      |) ORDER BY column_name""".stripMargin

  // ---------------------------------------------------------------
  // Poisson-bootstrap confidence interval for the mean quality score
  // — THE at-scale bootstrap (Chamandy et al., Google 2012 "Estimating
  // uncertainty for massive data streams"; Kleiner's BLB is the other
  // branch): classical resampling needs n draws per replicate
  // coordinated across the cluster, but multinomial(n, 1/n) counts
  // converge to iid Poisson(1) weights — so each row independently
  // computes its own 32 replicate weights in ONE pass, no resampling
  // shuffle, no coordination. Here the weights are DERANDOMIZED and
  // the doc hashes ONCE (r15 verdict #4 — the per-(doc, b) md5 made
  // this query the suite's steady ceiling at B× the necessary
  // hashing): h = md5(doc_id) reduced mod P = 2³¹−1, then replicate
  // b draws u_b = (h·a_b + b) mod P with its OWN multiplier
  // a_b = (1099087573·(b+1)) mod P — the (a·x + b) mod P
  // pairwise-independent family the Count-Min sketch already uses,
  // one multiplier per replicate, so replicates decorrelate the way
  // per-depth sketch hashes do. w_b = Poisson(1) inverse CDF at u_b
  // via nine precomputed INTEGER cutoffs at P scale — the weight
  // comes from integer comparisons, deterministic and identical in
  // both engines (no RNG, stable under reruns; every product is
  // bounded by 2⁶² so neither engine can overflow int64).
  //
  // Scale shape: one corpus pass computes each doc's 32-weight array
  // row-locally; the replicate explode reduces map-side into 32
  // (Σwv, Σw) partials, and everything after is 32-row arithmetic.
  //
  // Determinism: weights are integers, scores 3-dp — Σwv sums in
  // DECIMAL; each replicate mean snaps at 6 dp and then QUANTIZES to
  // an exact integer (×10⁶), so the replicate variance is pure
  // integer arithmetic (B·ΣM² − (ΣM)²) with no double→decimal snap
  // anywhere near a halfway point. CI is the normal-approximation
  // mean ± 1.96·se_boot (the practical form; percentile CIs need
  // B ≥ a few hundred to mean anything).
  private val bootB = 32
  // Poisson(1) CDF cutoffs at P = 2³¹−1 scale: round(F(k)·P), k = 0..8
  private val poisCuts = Seq(790015084L, 1580030168L, 1975037710L,
    2106706891L, 2139624186L, 2146207645L, 2147304888L, 2147461637L, 2147481231L)
  private val BootP = 2147483647L // 2^31 - 1, Mersenne prime
  private val BootMult = 1099087573L

  private def bootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    val cutsArr = poisCuts.mkString("array(", "L, ", "L)")
    // The scoring projection materializes through the interpreted
    // row-writer (higher-order lambdas disable whole-stage codegen for
    // the pinned frame below), so spread it across the executor pool
    // when the scan arrives in fewer splits than cores — the harness's
    // single parquet file otherwise serializes the whole corpus pass
    // onto one task (measured 1.35 s → 0.55 s at sf0.1). At scale the
    // scan already has >= cores splits and NO shuffle is added.
    val base = Tables.table(spark, dir, "documents")
    val par = spark.sparkContext.defaultParallelism
    val spread =
      if (base.queryExecution.toRdd.getNumPartitions >= par) base
      else base.repartition(par)
    val scored = spread
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("n_stop", expr(
        "size(filter(ws, w -> w IN ('the','a','and','of','to','in')))").cast("long"))
      .withColumn("v", rnd(
        lit(0.5) * least(col("n_words").cast("double") / 100.0, lit(1.0)) +
          lit(0.5) * (lit(1.0) - rnd(col("n_stop").cast("double") / col("n_words"), 3)),
        3).cast("decimal(6,3)"))
      .withColumn("hp", expr(
        s"cast(conv(substring(md5(cast(doc_id AS string)), 1, 8), 16, 10) AS bigint) % $BootP"))
      .withColumn("wts", expr(
        s"""transform(sequence(0, ${bootB - 1}), b -> size(filter($cutsArr,
           |  c -> (hp * ((${BootMult}L * (b + 1)) % ${BootP}L) + b) % ${BootP}L >= c)))""".stripMargin))
      // pin the 33-values-per-doc scored frame BEFORE the replicate
      // explode: the optimizer otherwise collapses the text-split
      // scoring + interpreted higher-order weight lambdas into the
      // Generate's projection and re-evaluates them per EXPLODED row
      // (measured 2.4 s vs 0.19 s at sf0.1 — BootProfile). The pin is
      // a partition-local spillable materialization, linear in the
      // corpus with no shuffle — the same cost class as the explode
      // itself, so the shape survives scale.
      .select(col("v"), col("wts"))
      .localCheckpoint()
    // replicate means quantize to exact 6-dp integers (M = m_b·10⁶) so
    // the variance runs in PURE INTEGER arithmetic — B·ΣM² − (ΣM)² —
    // with no double→decimal snap anywhere near a halfway point.
    // The full-corpus mean rides the SAME exploded aggregation: every
    // doc appears exactly once per replicate group, so any group's
    // (Σv, count) IS the full corpus's — the corpus is scored ONCE
    // per invocation, not twice (the second standalone scoring pass
    // was half this query's steady cost).
    val reps = scored
      .select(col("v"), posexplode(col("wts")).as(Seq("b", "w")))
      .groupBy(col("b"))
      .agg(sum(col("w") * col("v")).as("swv"), sum(col("w")).as("sw"),
        sum(col("v")).as("sv"), count(lit(1)).as("cnt"))
      .withColumn("mq", (rnd(col("swv").cast("double") / col("sw"), 6)
        .cast("decimal(18,6)") * 1000000).cast("long"))
    reps
      .agg(sum(col("mq")).as("sm"), sum(col("mq") * col("mq")).as("smm"),
        max(col("sv")).as("sv"), max(col("cnt")).as("n"))
      .withColumn("mean_full", rnd(col("sv").cast("double") / col("n"), 6))
      .withColumn("ss_scaled",
        lit(bootB.toLong) * col("smm") - col("sm") * col("sm"))
      .withColumn("se_boot", rnd(
        sqrt(col("ss_scaled").cast("double") / (bootB.toLong * (bootB - 1))) / 1000000.0, 6))
      .select(col("n"), lit(bootB).as("b_replicates"), col("mean_full"),
        col("se_boot"),
        rnd(col("mean_full") - lit(1.96) * col("se_boot"), 6).as("ci_lo"),
        rnd(col("mean_full") + lit(1.96) * col("se_boot"), 6).as("ci_hi"))
  }

  private lazy val bootstrapCiSql = {
    val cuts = poisCuts.mkString("[", ", ", "]")
    s"""WITH scored AS (
       |  SELECT doc_id,
       |    CAST(CAST(round(CAST(0.5 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
       |      + 0.5 * (1.0 - CAST(round(CAST(CAST(len(list_filter(string_split(text, ' '),
       |        w -> w IN ('the','a','and','of','to','in'))) AS DOUBLE)
       |        / len(string_split(text, ' ')) AS DECIMAL(18,8)), 3) AS DOUBLE))
       |      AS DECIMAL(18,8)), 3) AS DOUBLE) AS DECIMAL(6,3)) AS v,
       |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % $BootP AS hp
       |  FROM documents
       |), reps AS (
       |  SELECT b,
       |    sum(w * v) AS swv, CAST(sum(w) AS BIGINT) AS sw
       |  FROM (
       |    SELECT s.v, b.b,
       |      len(list_filter($cuts,
       |        c -> (s.hp * (($BootMult * (b.b + 1)) % $BootP) + b.b) % $BootP >= c)) AS w
       |    FROM scored s CROSS JOIN (SELECT unnest(range(0, $bootB)) AS b) b
       |  ) GROUP BY b
       |), m AS (
       |  SELECT b, CAST(CAST(round(CAST(CAST(swv AS DOUBLE) / sw AS DECIMAL(18,8)), 6)
       |    AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS mq
       |  FROM reps
       |), ss AS (
       |  SELECT CAST($bootB * sum(mq * mq) - sum(mq) * sum(mq) AS BIGINT) AS ss_scaled
       |  FROM m
       |), fl AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(round(CAST(CAST(sum(v) AS DOUBLE) / count(*) AS DECIMAL(18,8)), 6) AS DOUBLE) AS mean_full
       |  FROM scored
       |)
       |SELECT n, $bootB AS b_replicates, mean_full,
       |  CAST(round(CAST(sqrt(CAST(ss_scaled AS DOUBLE) / ${bootB.toLong * (bootB - 1)}) / 1000000.0
       |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS se_boot,
       |  CAST(round(CAST(mean_full - 1.96 * CAST(round(CAST(sqrt(CAST(ss_scaled AS DOUBLE)
       |    / ${bootB.toLong * (bootB - 1)}) / 1000000.0
       |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS DECIMAL(18,8)), 6) AS DOUBLE) AS ci_lo,
       |  CAST(round(CAST(mean_full + 1.96 * CAST(round(CAST(sqrt(CAST(ss_scaled AS DOUBLE)
       |    / ${bootB.toLong * (bootB - 1)}) / 1000000.0
       |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS DECIMAL(18,8)), 6) AS DOUBLE) AS ci_hi
       |FROM ss, fl""".stripMargin
  }

  // ---------------------------------------------------------------
  // Reciprocal rank fusion (Cormack et al., SIGIR 2009) of two
  // document rankings — quality score and document length — into the
  // standard RRF ensemble: fused(d) = Σ_r 1/(60 + rank_r(d)). THE
  // rank-ensembling primitive (multi-signal curation, hybrid
  // retrieval); rank-based fusion is immune to the signals'
  // incomparable scales.
  //
  // Scale shape: NO global sort anywhere — both signals live on
  // bounded grids (3-dp score ≤ 1001 levels, word counts similarly
  // discrete), so each doc's competition rank is `1 + Σ counts of
  // strictly-better levels`, a cumulative window over the tiny level
  // table broadcast back over the corpus (the budget_select /
  // conformal level-table discipline). The top-20 report is
  // TakeOrderedAndProject.
  //
  // Determinism: ranks are exact integers; each reciprocal is the
  // same double in both engines (integer inputs, one division) and
  // the 2-term sum is order-fixed; fused snaps at 8.
  private def rankFusion(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.table(spark, dir, "documents")
      .withColumn("ws", split(col("text"), " "))
      .withColumn("nw", size(col("ws")).cast("long"))
      .withColumn("n_stop", expr(
        "size(filter(ws, w -> w IN ('the','a','and','of','to','in')))").cast("long"))
      .withColumn("v", rnd(
        lit(0.5) * least(col("nw").cast("double") / 100.0, lit(1.0)) +
          lit(0.5) * (lit(1.0) - rnd(col("n_stop").cast("double") / col("nw"), 3)),
        3))
      .select(col("doc_id"), col("v"), col("nw"))
    def ranks(valCol: String): DataFrame = {
      val w = Window.orderBy(col(valCol).desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      scored.groupBy(col(valCol)).agg(count(lit(1)).as("cnt"))
        .withColumn("rk", coalesce(sum(col("cnt")).over(w), lit(0L)) + 1)
        .select(col(valCol), col("rk"))
    }
    scored
      .join(broadcast(ranks("v").withColumnRenamed("rk", "rank_quality")), "v")
      .join(broadcast(ranks("nw").withColumnRenamed("rk", "rank_length")), "nw")
      .withColumn("rrf_score", rnd(
        lit(1.0) / (lit(60) + col("rank_quality")) + lit(1.0) / (lit(60) + col("rank_length")), 8))
      .select(col("doc_id"), col("rank_quality"), col("rank_length"), col("rrf_score"))
      .orderBy(col("rrf_score").desc, col("doc_id")).limit(20)
  }

  private val rankFusionSql =
    """WITH scored AS (
      |  SELECT doc_id,
      |    CAST(round(CAST(0.5 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
      |      + 0.5 * (1.0 - CAST(round(CAST(CAST(len(list_filter(string_split(text, ' '),
      |        w -> w IN ('the','a','and','of','to','in'))) AS DOUBLE)
      |        / len(string_split(text, ' ')) AS DECIMAL(18,8)), 3) AS DOUBLE))
      |      AS DECIMAL(18,8)), 3) AS DOUBLE) AS v,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nw
      |  FROM documents
      |), r AS (
      |  SELECT doc_id,
      |    rank() OVER (ORDER BY v DESC) AS rank_quality,
      |    rank() OVER (ORDER BY nw DESC) AS rank_length
      |  FROM scored
      |)
      |SELECT doc_id, CAST(rank_quality AS BIGINT) AS rank_quality,
      |  CAST(rank_length AS BIGINT) AS rank_length,
      |  CAST(round(CAST(1.0 / (60 + rank_quality) + 1.0 / (60 + rank_length)
      |    AS DECIMAL(18,8)), 8) AS DOUBLE) AS rrf_score
      |FROM r
      |ORDER BY rrf_score DESC, doc_id LIMIT 20""".stripMargin

  // ---------------------------------------------------------------
  // Theil-Sen robust trend + Mann-Kendall test of the daily event
  // volume per type — the outlier-resistant alternative to the OLS
  // trend (eval_ols_doclen): the Sen slope is the MEDIAN of all
  // pairwise day-to-day slopes (a single corrupted day moves OLS
  // arbitrarily, moves the median not at all), and the Mann-Kendall S
  // statistic is the integer sum of pairwise signs, with its normal
  // approximation z = (S - sgn(S)) / sqrt(Var S) under the TIE-CORRECTED
  // variance Var S = [n(n-1)(2n+5) - Σ_g t_g(t_g-1)(2t_g+5)] / 18
  // (t_g = size of each tied-value group): small integer daily counts
  // tie often, and the no-ties form overstates z exactly then (r15
  // advice). All-tied series (Var S = 0, S = 0) emit NULL z.
  //
  // Scale shape: ONE map-side-combinable pass reduces the corpus to
  // |types| × |days| rows (the time SPAN is fixed by the data's
  // calendar, not its volume — 100 TB of events over the same month
  // still reduces to 30 rows per type); the pairwise self-join runs
  // only over that bounded frame. An unbounded span gets windowed
  // Theil-Sen (pairs within a bounded day lag) — the standard
  // remediation, noted not needed at any tested SF.
  //
  // Determinism: daily counts and MK signs are exact integers; each
  // slope is one double division snapped at 6 dp BEFORE the median
  // (both engines interpolate even-count medians as the mean of the
  // two middle values — identical on 6-dp-snapped operands).
  private def theilsenTrend(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .withColumn("day", floor(col("ts").cast("long") / 86400L).cast("long"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n"))
    val nd = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("n")).as("n_events"))
    val b = daily.select(col("event_type").as("et2"), col("day").as("d2"), col("n").as("n2"))
    val pairs = daily
      .join(b, col("event_type") === col("et2") && col("day") < col("d2"))
      .withColumn("slope",
        rnd((col("n2") - col("n")).cast("double") / (col("d2") - col("day")), 6))
      .withColumn("sgn",
        when(col("n2") > col("n"), 1L).when(col("n2") < col("n"), -1L).otherwise(0L))
    val st = pairs.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("sgn")).as("mk_s"),
        rnd(median(col("slope")), 6).as("sen_slope"))
    // tie-group sizes among the daily counts: every type gets a row
    // (an all-distinct series contributes t = 1 groups, term 0)
    val ties = daily.groupBy(col("event_type"), col("n"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("event_type"))
      .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5)).as("tie_term"))
    nd.join(st, Seq("event_type")).join(ties, Seq("event_type"))
      .withColumn("var_s",
        (col("n_days") * (col("n_days") - 1) * (lit(2) * col("n_days") + 5)
          - col("tie_term")).cast("double") / 18.0d)
      .withColumn("mk_z", when(col("var_s") > 0, rnd(
        (col("mk_s") - signum(col("mk_s"))).cast("double") / sqrt(col("var_s")), 6)))
      .select(col("event_type"), col("n_days"), col("n_events"), col("n_pairs"),
        col("mk_s"), col("sen_slope"), col("mk_z"))
      .orderBy(col("event_type"))
  }

  private val theilsenTrendSql =
    """WITH daily AS (
      |  SELECT event_type, epoch_ns(ts)//1000000000//86400 AS day, count(*) AS n
      |  FROM events GROUP BY 1, 2
      |), nd AS (
      |  SELECT event_type, count(*) AS n_days, sum(n) AS n_events FROM daily GROUP BY 1
      |), pairs AS (
      |  SELECT a.event_type,
      |    CAST(round(CAST(CAST(b.n - a.n AS DOUBLE) / (b.day - a.day)
      |      AS DECIMAL(18,8)), 6) AS DOUBLE) AS slope,
      |    CASE WHEN b.n > a.n THEN 1 WHEN b.n < a.n THEN -1 ELSE 0 END AS sgn
      |  FROM daily a JOIN daily b ON a.event_type = b.event_type AND a.day < b.day
      |), st AS (
      |  SELECT event_type, count(*) AS n_pairs, sum(sgn) AS mk_s,
      |    CAST(round(CAST(median(slope) AS DECIMAL(18,8)), 6) AS DOUBLE) AS sen_slope
      |  FROM pairs GROUP BY 1
      |), ties AS (
      |  SELECT event_type, sum(t * (t - 1) * (2 * t + 5)) AS tie_term FROM (
      |    SELECT event_type, n, count(*) AS t FROM daily GROUP BY 1, 2) g
      |  GROUP BY 1
      |), v AS (
      |  SELECT nd.event_type, nd.n_days, nd.n_events, st.n_pairs, st.mk_s, st.sen_slope,
      |    CAST(nd.n_days * (nd.n_days - 1) * (2 * nd.n_days + 5)
      |      - ties.tie_term AS DOUBLE) / 18.0 AS var_s
      |  FROM nd JOIN st USING (event_type) JOIN ties USING (event_type)
      |)
      |SELECT event_type, n_days, CAST(n_events AS BIGINT) AS n_events,
      |  n_pairs, CAST(mk_s AS BIGINT) AS mk_s, sen_slope,
      |  CASE WHEN var_s > 0 THEN
      |    CAST(round(CAST(CAST(mk_s
      |        - (CASE WHEN mk_s > 0 THEN 1 WHEN mk_s < 0 THEN -1 ELSE 0 END) AS DOUBLE)
      |      / sqrt(var_s) AS DECIMAL(18,8)), 6) AS DOUBLE) END AS mk_z
      |FROM v
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------
  // Count-Min sketch accuracy audit over per-user event counts — the
  // heavy-hitter sketch (Cormode & Muthukrishnan) next to KMV
  // (distinct counting) and SpaceSaving (streaming top-k): depth 4 ×
  // width 64 counters under pairwise-independent hashes
  // h_d(u) = ((a_d·u + b_d) mod P) mod W with P = 2^31 - 1, estimate =
  // min over depths, which can only OVER-estimate. The audit reports
  // the top-20 exact heavy hitters with their sketch estimates and
  // overestimates (exact integers), plus the guarantee line: eps·N =
  // (e/W)·N, the additive error bound held with prob 1 - e^-depth.
  //
  // Scale shape: the sketch is the POINT at 100 TB — counters build in
  // one map-side-combinable pass (the per-(d, idx) reduction is the
  // sketch-merge monoid; 256 cells total regardless of user
  // cardinality) and broadcast back over the top-k probe (itself a
  // TakeOrdered). The per-user exact side exists only because this IS
  // the accuracy audit; production reads the sketch alone.
  //
  // Determinism: everything through the min() is 64-bit integer
  // arithmetic (a_d·u fits: a < 2^21, u < 2^42); only the final
  // relative-overestimate ratio divides, snapped at 6 dp.
  private val CmW = CountMin.W
  private val CmA = CountMin.A
  private val CmB = CountMin.B
  private val CmP = CountMin.P

  private def countMinAudit(spark: SparkSession, dir: String): DataFrame = {
    // |users| rows, consumed by every per-depth union branch plus the
    // total and the top-20 probe (the r18 before-plan replayed the
    // events aggregation 9× / 18 scans) — pin once (guide §5)
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
      .localCheckpoint()
    def idx(d: Int, u: Column): Column = CountMin.idxCol(d, u)
    // counters: one exploded pass over the per-user reduction — the
    // same 256 cells a direct stream sketch would hold (sum of counts
    // per cell ≡ sketching the raw stream, counter by counter)
    val depths = (0 until CmA.size).map { d =>
      perUser.select(lit(d).as("d"), idx(d, col("user_id")).as("cell"),
        col("n_exact").as("n"))
    }.reduce(_.unionAll(_))
    val counters = depths.groupBy(col("d"), col("cell")).agg(sum(col("n")).as("cnt"))
    val total = perUser.agg(sum(col("n_exact")).as("n_total"))
    val top = perUser
      .orderBy(col("n_exact").desc, col("user_id")).limit(20)
    val probes = (0 until CmA.size).map { d =>
      top.select(col("user_id"), col("n_exact"),
        lit(d).as("d"), idx(d, col("user_id")).as("cell"))
    }.reduce(_.unionAll(_))
    probes.join(broadcast(counters), Seq("d", "cell"))
      .groupBy(col("user_id"), col("n_exact"))
      .agg(min(col("cnt")).as("n_est"))
      .crossJoin(broadcast(total))
      .withColumn("overest", col("n_est") - col("n_exact"))
      .withColumn("rel_overest", rnd(
        (col("n_est") - col("n_exact")).cast("double") / col("n_exact"), 6))
      .withColumn("eps_n", rnd(lit(math.E) / CmW * col("n_total"), 2))
      .withColumn("within_bound", col("n_est") - col("n_exact") <= lit(math.E) / CmW * col("n_total"))
      .select(col("user_id"), col("n_exact"), col("n_est"), col("overest"),
        col("rel_overest"), col("eps_n"), col("within_bound"))
      .orderBy(col("n_exact").desc, col("user_id"))
  }

  private val countMinAuditSql = {
    val cells = (0 until CmA.size).map { d =>
      s"SELECT user_id, n_exact, $d AS d, ((user_id * ${CmA(d)} + ${CmB(d)}) % $CmP) % $CmW AS cell FROM per_user"
    }.mkString("\n  UNION ALL ")
    s"""WITH per_user AS (
      |  SELECT user_id, count(*) AS n_exact FROM events GROUP BY 1
      |), hashes AS (
      |  $cells
      |), counters AS (
      |  SELECT d, cell, sum(n_exact) AS cnt FROM hashes GROUP BY 1, 2
      |), total AS (
      |  SELECT sum(n_exact) AS n_total FROM per_user
      |), top AS (
      |  SELECT user_id, n_exact FROM per_user
      |  ORDER BY n_exact DESC, user_id LIMIT 20
      |), est AS (
      |  SELECT h.user_id, h.n_exact, min(c.cnt) AS n_est
      |  FROM hashes h
      |  JOIN top t ON t.user_id = h.user_id
      |  JOIN counters c ON c.d = h.d AND c.cell = h.cell
      |  GROUP BY 1, 2
      |)
      |SELECT user_id, n_exact, CAST(n_est AS BIGINT) AS n_est,
      |  CAST(n_est - n_exact AS BIGINT) AS overest,
      |  CAST(round(CAST(CAST(n_est - n_exact AS DOUBLE) / n_exact
      |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS rel_overest,
      |  CAST(round(CAST(2.718281828459045 / $CmW * t.n_total
      |    AS DECIMAL(18,8)), 2) AS DOUBLE) AS eps_n,
      |  (n_est - n_exact) <= 2.718281828459045 / $CmW * t.n_total AS within_bound
      |FROM est, total t
      |ORDER BY n_exact DESC, user_id""".stripMargin
  }

  // ---------------------------------------------------------------
  // A/B experiment power analysis from observed moments — the design
  // step BEFORE events_ab_cuped reads an experiment out: per event
  // type, the sample size each arm needs to detect a 5% relative lift
  // of the metric at α = 0.05 (two-sided) and 80% power,
  // n = 2σ²(z_{α/2} + z_β)² / δ². σ² and the mean come from three
  // sufficient statistics (n, Σv, Σv² — the CUPED discipline: each
  // term snaps to DECIMAL(18,4) before the order-free sum), and the
  // readiness flag says whether the fixture's own traffic already
  // covers the requirement (both arms drawn from this type's volume).
  //
  // Scale shape: ONE map-side-combinable pass to |types| rows of
  // integer-exact DECIMAL moments; everything after is per-row scalar
  // math. The z constants are literals squared identically in both
  // engines; σ², δ and n_per_arm each snap before the next step so the
  // ceil() boundary cannot drift cross-engine.
  private def powerAnalysis(spark: SparkSession, dir: String): DataFrame = {
    val zSum = "(1.959963985 + 0.8416212336)" // z_{0.025} + z_{0.2}
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_obs"),
        sum(dec(col("value"))).as("s1"),
        sum(dec(col("value") * col("value"))).as("s2"))
      .withColumn("mean_v", rnd(col("s1").cast("double") / col("n_obs"), 6))
      .withColumn("var_v", rnd(
        (col("s2").cast("double") - col("s1").cast("double") * col("s1").cast("double")
          / col("n_obs")) / (col("n_obs") - 1), 6))
      .withColumn("mde_abs", rnd(lit(0.05) * col("mean_v"), 6))
      // degenerate-source guard (r15 advice): a zero-mean metric has
      // mde_abs = 0 — Spark (non-ANSI) folds the Infinity through
      // ceil/cast to a garbage BIGINT while DuckDB raises on the cast.
      // Emit NULL n_per_arm/powered in BOTH twins instead (the
      // olsDoclen degenerate-source convention).
      .withColumn("n_per_arm", when(col("mde_abs") > 0, ceil(
        lit(2.0) * col("var_v") * expr(s"pow($zSum, 2.0)")
          / (col("mde_abs") * col("mde_abs"))).cast("long")))
      .withColumn("powered",
        when(col("mde_abs") > 0, col("n_obs") >= lit(2) * col("n_per_arm")))
      .select(col("event_type"), col("n_obs"), col("mean_v"), col("var_v"),
        col("mde_abs"), col("n_per_arm"), col("powered"))
      .orderBy(col("event_type"))
  }

  private val powerAnalysisSql =
    """WITH m AS (
      |  SELECT event_type, count(*) AS n_obs,
      |    sum(CAST(value AS DECIMAL(18,4))) AS s1,
      |    sum(CAST(value * value AS DECIMAL(18,4))) AS s2
      |  FROM events GROUP BY 1
      |), d AS (
      |  SELECT event_type, n_obs,
      |    CAST(round(CAST(CAST(s1 AS DOUBLE) / n_obs AS DECIMAL(18,8)), 6) AS DOUBLE) AS mean_v,
      |    CAST(round(CAST((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_obs)
      |      / (n_obs - 1) AS DECIMAL(18,8)), 6) AS DOUBLE) AS var_v
      |  FROM m
      |), e AS (
      |  SELECT *, CAST(round(CAST(0.05 * mean_v AS DECIMAL(18,8)), 6) AS DOUBLE) AS mde_abs
      |  FROM d
      |)
      |SELECT event_type, n_obs, mean_v, var_v, mde_abs,
      |  CASE WHEN mde_abs > 0 THEN
      |    CAST(ceil(2.0 * var_v * pow(1.959963985 + 0.8416212336, 2.0)
      |      / (mde_abs * mde_abs)) AS BIGINT) END AS n_per_arm,
      |  CASE WHEN mde_abs > 0 THEN
      |    n_obs >= 2 * CAST(ceil(2.0 * var_v * pow(1.959963985 + 0.8416212336, 2.0)
      |      / (mde_abs * mde_abs)) AS BIGINT) END AS powered
      |FROM e
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------
  // Kendall's τ-b between quality score and document length — the
  // concordance-based rank correlation next to Spearman
  // (eval_spearman_doclen): τ counts PAIR ORDERINGS, so it is robust
  // to any monotone transform and has the cleaner interpretation
  // ("probability a random pair agrees in order, minus disagrees").
  // The textbook objection at scale is the O(N²) pair enumeration;
  // here concordant/discordant counts come from 2-D DOMINANCE
  // COUNTING on the bounded VALUE GRID: quality lives on the 3-dp
  // milli grid (≤1001 levels) and length is COARSENED onto a fixed
  // ≤4096-level grid (len div 16, capped — r16 verdict #6: raw
  // distinct char-lengths made the densified grid corpus-DEPENDENT,
  // ~10⁹ rows at 100 TB; an a-priori monotone coarsening is the
  // standard move for rank statistics on massive data, the extra
  // within-bucket ties flow through τ-b's tie terms and BOTH twins
  // coarsen identically). The (quality, length-bucket) histogram —
  // densified by crossing the two observed level tables — is then a
  // ≤1001×4096 CORPUS-INDEPENDENT frame, and two chained EXCLUSIVE
  // prefix windows (cum over length within quality, then cum over
  // quality within length) give every cell its strictly-dominated
  // mass. C = Σ n·|{strictly lower in
  // both}| counts each concordant pair exactly once at its upper
  // cell; D symmetrically with the length direction reversed. The
  // level-table discipline (conformal/budget_select/mannwhitney)
  // extended to two dimensions — no global sort, no pair join, no
  // corpus-sized window.
  //
  // Determinism: C, D and the tie terms are exact BIGINTs;
  // N0−N1 and N0−N2 reach ~1.6·10¹¹ at sf10 (their PRODUCT would
  // overflow int64 past N≈3M, so each square-roots separately in
  // double — exact for integers below 2⁵³); τ-b snaps at 6 dp; a
  // degenerate slice (all values tied on either axis) emits NULL.
  // fixed a-priori length grid: bucket width 16 chars, capped at 4096
  // levels — corpus-independent constants, so the densified dominance
  // grid is bounded by 1001 × 4096 cells at ANY corpus size
  private val KtLenBucketWidth = 16L
  private val KtLenBucketCap = 4095L
  private def kendallTau(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.table(spark, dir, "documents")
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("n_stop", expr(
        "size(filter(ws, w -> w IN ('the','a','and','of','to','in')))").cast("long"))
      .withColumn("v", rnd(
        lit(0.5) * least(col("n_words").cast("double") / 100.0, lit(1.0)) +
          lit(0.5) * (lit(1.0) - rnd(col("n_stop").cast("double") / col("n_words"), 3)),
        3).cast("decimal(6,3)"))
      .select((col("v") * 1000).cast("long").as("qm"),
        least(expr(s"n_chars div $KtLenBucketWidth"), lit(KtLenBucketCap)).as("len"))
    // the ONE corpus pass: everything downstream (dense grid, total,
    // both tie terms) derives from this bounded cell frame, which is
    // pinned because four branches consume it (the repo's
    // pin-what-is-consumed-more-than-once discipline)
    val cells = scored.groupBy(col("qm"), col("len")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val dense = cells.select(col("qm")).distinct()
      .crossJoin(cells.select(col("len")).distinct())
      .join(cells, Seq("qm", "len"), "left")
      .withColumn("n", coalesce(col("cnt"), lit(0L)))
    val wLasc = Window.partitionBy(col("qm")).orderBy(col("len"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wLdesc = Window.partitionBy(col("qm")).orderBy(col("len").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wQexcl = Window.partitionBy(col("len")).orderBy(col("qm"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val dom = dense
      .withColumn("cl_lt", coalesce(sum(col("n")).over(wLasc), lit(0L)))
      .withColumn("cl_gt", coalesce(sum(col("n")).over(wLdesc), lit(0L)))
      .withColumn("lt_lt", coalesce(sum(col("cl_lt")).over(wQexcl), lit(0L)))
      .withColumn("lt_gt", coalesce(sum(col("cl_gt")).over(wQexcl), lit(0L)))
    val cd = dom.agg(
      sum(col("n") * col("lt_lt")).as("concordant"),
      sum(col("n") * col("lt_gt")).as("discordant"))
    val nTot = cells.agg(sum(col("cnt")).as("n_docs"))
    val tiesQ = cells.groupBy(col("qm")).agg(sum(col("cnt")).as("t"))
      .agg(sum(expr("t * (t - 1) div 2")).as("ties_q"))
    val tiesL = cells.groupBy(col("len")).agg(sum(col("cnt")).as("t"))
      .agg(sum(expr("t * (t - 1) div 2")).as("ties_len"))
    cd.crossJoin(broadcast(nTot)).crossJoin(broadcast(tiesQ)).crossJoin(broadcast(tiesL))
      .withColumn("n0", expr("n_docs * (n_docs - 1) div 2"))
      .withColumn("tau_b",
        when(col("n0") > col("ties_q") && col("n0") > col("ties_len"), rnd(
          (col("concordant") - col("discordant")).cast("double")
            / (sqrt((col("n0") - col("ties_q")).cast("double"))
              * sqrt((col("n0") - col("ties_len")).cast("double"))), 6)))
      .select(col("n_docs"), col("n0").as("n_pairs"), col("concordant"),
        col("discordant"), col("ties_q"), col("ties_len"), col("tau_b"))
  }

  private val kendallTauSql =
    s"""WITH scored AS (
      |  SELECT CAST(CAST(round(CAST(0.5 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
      |      + 0.5 * (1.0 - CAST(round(CAST(CAST(len(list_filter(string_split(text, ' '),
      |        w -> w IN ('the','a','and','of','to','in'))) AS DOUBLE)
      |        / len(string_split(text, ' ')) AS DECIMAL(18,8)), 3) AS DOUBLE))
      |      AS DECIMAL(18,8)), 3) AS DECIMAL(6,3)) * 1000 AS BIGINT) AS qm,
      |    least(n_chars // $KtLenBucketWidth, $KtLenBucketCap) AS len
      |  FROM documents
      |), cells AS (
      |  SELECT qm, len, count(*) AS cnt FROM scored GROUP BY 1, 2
      |), dense AS (
      |  SELECT q.qm, l.len, coalesce(c.cnt, 0) AS n
      |  FROM (SELECT DISTINCT qm FROM cells) q
      |  CROSS JOIN (SELECT DISTINCT len FROM cells) l
      |  LEFT JOIN cells c ON c.qm = q.qm AND c.len = l.len
      |), dom AS (
      |  SELECT qm, len, n,
      |    coalesce(sum(cl_lt) OVER (PARTITION BY len ORDER BY qm
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lt_lt,
      |    coalesce(sum(cl_gt) OVER (PARTITION BY len ORDER BY qm
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lt_gt
      |  FROM (
      |    SELECT qm, len, n,
      |      coalesce(sum(n) OVER (PARTITION BY qm ORDER BY len
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cl_lt,
      |      coalesce(sum(n) OVER (PARTITION BY qm ORDER BY len DESC
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cl_gt
      |    FROM dense
      |  )
      |), cd AS (
      |  SELECT CAST(sum(n * lt_lt) AS BIGINT) AS concordant,
      |    CAST(sum(n * lt_gt) AS BIGINT) AS discordant
      |  FROM dom
      |), nt AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_docs FROM cells
      |), tq AS (
      |  SELECT CAST(sum(t * (t - 1) // 2) AS BIGINT) AS ties_q
      |  FROM (SELECT sum(cnt) AS t FROM cells GROUP BY qm)
      |), tl AS (
      |  SELECT CAST(sum(t * (t - 1) // 2) AS BIGINT) AS ties_len
      |  FROM (SELECT sum(cnt) AS t FROM cells GROUP BY len)
      |), fin AS (
      |  SELECT cd.concordant, cd.discordant, nt.n_docs, tq.ties_q, tl.ties_len,
      |    n_docs * (n_docs - 1) // 2 AS n0
      |  FROM cd, nt, tq, tl
      |)
      |SELECT n_docs, CAST(n0 AS BIGINT) AS n_pairs, concordant, discordant,
      |  ties_q, ties_len,
      |  CASE WHEN n0 > ties_q AND n0 > ties_len THEN
      |    CAST(round(CAST(CAST(concordant - discordant AS DOUBLE)
      |      / (sqrt(CAST(n0 - ties_q AS DOUBLE)) * sqrt(CAST(n0 - ties_len AS DOUBLE)))
      |      AS DECIMAL(18,8)), 6) AS DOUBLE) END AS tau_b
      |FROM fin""".stripMargin

  // ---------------------------------------------------------------
  // Mann–Whitney U (Wilcoxon rank-sum) — the NONPARAMETRIC two-sample
  // location test between the two largest sources' document lengths,
  // the distribution-free sibling of the permutation test (no
  // relabeling loop — the null quantifies over RANKS) and the rank
  // analog of the t-test the robust-stats family lacks. Tie-corrected
  // normal approximation: z = (U₁ − n₁n₂/2) / sqrt(Var U) with
  // Var U = n₁n₂/12 · [(N+1) − Σ(t³−t)/(N(N−1))] over tie groups t.
  //
  // Scale shape: NO global rank sort — n_chars lives on a bounded
  // integer grid, so tie-averaged ranks come from the VALUE HISTOGRAM
  // (the conformal/budget_select level-table discipline): one
  // map-side pass to |distinct values| rows with per-sample counts,
  // one cumulative window over that level table, one-row arithmetic
  // after. The doubled-rank trick (2·c_below + t + 1 is an exact
  // integer for every tie-averaged rank — the eval_spearman_doclen
  // discipline) keeps rank sums in pure BIGINT; U₁ re-halves exactly
  // on the .5 grid. Σ(t³−t) fits int64 through sf10 with three orders
  // of headroom (t ≤ N ≈ 5·10⁵ → t³ ≤ 1.25·10¹⁷); a 100 TB corpus
  // upgrades the tie sum to DECIMAL(38,0) — the documented remediation.
  //
  // Determinism: every statistic through U₁ is exact integer
  // arithmetic; var_u and z snap at 6 dp; an all-tied slice
  // (Var U = 0) emits NULL z — the degenerate-source convention.
  private def mannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.table(spark, dir, "documents")
      .select(col("source"), col("n_chars"))
    val top2 = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("source")).limit(2)
      .withColumn("which", row_number().over(
        Window.orderBy(col("n").desc, col("source"))))
    val hist = docs.join(broadcast(top2.select(col("source"), col("which"))), "source")
      .groupBy(col("n_chars").as("v"))
      .agg(
        sum(when(col("which") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("which") === 2, 1L).otherwise(0L)).as("c2"))
    val wCum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = hist
      .withColumn("t", col("c1") + col("c2"))
      .withColumn("cbelow", sum(col("c1") + col("c2")).over(wCum) - col("t"))
    val agg = ranked.agg(
      sum(col("c1")).as("n_a"), sum(col("c2")).as("n_b"),
      sum(col("c1") * (lit(2) * col("cbelow") + col("t") + 1)).as("r2_a"),
      sum(col("t") * col("t") * col("t") - col("t")).as("tie_term"))
    val labels = top2.agg(
      max(when(col("which") === 1, col("source"))).as("source_a"),
      max(when(col("which") === 2, col("source"))).as("source_b"))
    agg.crossJoin(broadcast(labels))
      .withColumn("u_a",
        (col("r2_a") - col("n_a") * (col("n_a") + 1)).cast("double") / 2.0)
      .withColumn("nn", col("n_a") + col("n_b"))
      .withColumn("var_u", rnd(
        col("n_a").cast("double") * col("n_b") / 12.0 *
          ((col("nn") + 1).cast("double")
            - col("tie_term").cast("double") / (col("nn") * (col("nn") - 1))), 6))
      .withColumn("mw_z", when(col("var_u") > 0, rnd(
        (col("u_a") - col("n_a").cast("double") * col("n_b") / 2.0)
          / sqrt(col("var_u")), 6)))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("u_a"), col("tie_term"), col("var_u"), col("mw_z"))
  }

  private val mannWhitneySql =
    """WITH d AS (
      |  SELECT source, n_chars FROM documents
      |), top2 AS (
      |  SELECT source, n, row_number() OVER (ORDER BY n DESC, source) AS which
      |  FROM (SELECT source, count(*) AS n FROM d GROUP BY 1)
      |  ORDER BY n DESC, source LIMIT 2
      |), hist AS (
      |  SELECT d.n_chars AS v,
      |    CAST(sum(CASE WHEN t.which = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(sum(CASE WHEN t.which = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
      |  FROM d JOIN top2 t USING (source)
      |  GROUP BY 1
      |), ranked AS (
      |  SELECT v, c1, c2, c1 + c2 AS t,
      |    sum(c1 + c2) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - (c1 + c2) AS cbelow
      |  FROM hist
      |), agg AS (
      |  SELECT CAST(sum(c1) AS BIGINT) AS n_a, CAST(sum(c2) AS BIGINT) AS n_b,
      |    CAST(sum(c1 * (2 * cbelow + t + 1)) AS BIGINT) AS r2_a,
      |    CAST(sum(t * t * t - t) AS BIGINT) AS tie_term
      |  FROM ranked
      |), lab AS (
      |  SELECT max(CASE WHEN which = 1 THEN source END) AS source_a,
      |         max(CASE WHEN which = 2 THEN source END) AS source_b
      |  FROM top2
      |), fin AS (
      |  SELECT source_a, source_b, n_a, n_b,
      |    CAST(r2_a - n_a * (n_a + 1) AS DOUBLE) / 2.0 AS u_a,
      |    tie_term, n_a + n_b AS nn
      |  FROM agg, lab
      |), vu AS (
      |  SELECT *,
      |    CAST(round(CAST(CAST(n_a AS DOUBLE) * n_b / 12.0 *
      |      (CAST(nn + 1 AS DOUBLE) - CAST(tie_term AS DOUBLE) / (nn * (nn - 1)))
      |      AS DECIMAL(18,8)), 6) AS DOUBLE) AS var_u
      |  FROM fin
      |)
      |SELECT source_a, source_b, n_a, n_b, u_a, tie_term, var_u,
      |  CASE WHEN var_u > 0 THEN
      |    CAST(round(CAST((u_a - CAST(n_a AS DOUBLE) * n_b / 2.0) / sqrt(var_u)
      |      AS DECIMAL(18,8)), 6) AS DOUBLE) END AS mw_z
      |FROM vu""".stripMargin

  // ---------------------------------------------------------------
  // Derandomized permutation (randomization) test — does document
  // length differ between the two largest sources, with the null
  // distribution built by RE-LABELING instead of a parametric
  // assumption? The classic objection to permutation tests at scale is
  // the RNG: B independent shuffles of 100 TB don't replay. Here each
  // of the B = 200 pseudo-permutations assigns doc d under relabeling
  // b via the eval_bootstrap_ci hash discipline (md5 of d·1009 + b) —
  // fully deterministic, embarrassingly parallel, restart-free. The
  // statistic (mean length difference) uses INTEGER sums per (b,
  // label); only the final means divide, snapped at 6 dp before the
  // |stat_b| >= |obs| comparison so the extreme-count cannot drift
  // cross-engine. p = (1 + #extreme)/(B + 1), the add-one-smoothed
  // Monte-Carlo form.
  //
  // Scale shape: the two-source slice explodes ×B (a projection — no
  // shuffle), reduces to 2B rows with map-side partials, and the
  // verdict is window math on that frame. B and the slice are knobs;
  // nothing quadratic, nothing ordered.
  private val PermB = 200

  private def permutationTest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    // the two largest sources, deterministically (count desc, name)
    val top2 = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("source")).limit(2)
      .withColumn("which", row_number().over(
        Window.orderBy(col("n").desc, col("source"))))
    val slice = docs.join(broadcast(top2), "source")
    val obs = slice.groupBy(col("which"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s"))
      .agg(
        max(when(col("which") === 1, col("n"))).as("n_a"),
        max(when(col("which") === 2, col("n"))).as("n_b"),
        max(when(col("which") === 1, col("s"))).as("s_a"),
        max(when(col("which") === 2, col("s"))).as("s_b"))
      .withColumn("obs_diff", rnd(
        col("s_a").cast("double") / col("n_a")
          - col("s_b").cast("double") / col("n_b"), 6))
    val perms = slice
      .select(col("doc_id"), col("n_chars"),
        explode(sequence(lit(1), lit(PermB))).as("b"))
      .withColumn("lbl", expr(
        "cast(conv(substring(md5(cast(doc_id * 1009 + b AS string)), 1, 8), 16, 10) AS bigint) % 2"))
      .groupBy(col("b"), col("lbl"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s"))
      .groupBy(col("b"))
      .agg(
        max(when(col("lbl") === 0, col("n"))).as("n0"),
        max(when(col("lbl") === 1, col("n"))).as("n1"),
        max(when(col("lbl") === 0, col("s"))).as("s0"),
        max(when(col("lbl") === 1, col("s"))).as("s1"))
      .withColumn("stat", rnd(
        col("s0").cast("double") / col("n0") - col("s1").cast("double") / col("n1"), 6))
    perms.crossJoin(broadcast(obs))
      .agg(
        max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(col("obs_diff")).as("obs_diff"),
        sum(when(abs(col("stat")) >= abs(col("obs_diff")), 1L).otherwise(0L))
          .as("n_extreme"))
      .withColumn("b_perms", lit(PermB))
      .withColumn("p_value", rnd(
        (col("n_extreme") + 1).cast("double") / (PermB + 1), 6))
      .select(col("n_a"), col("n_b"), col("obs_diff"), col("b_perms"),
        col("n_extreme"), col("p_value"))
  }

  private val permutationTestSql =
    s"""WITH docs AS (
      |  SELECT doc_id, source, n_chars FROM documents
      |), top2 AS (
      |  SELECT source, row_number() OVER (ORDER BY n DESC, source) AS which
      |  FROM (SELECT source, count(*) AS n FROM docs GROUP BY 1)
      |  ORDER BY which LIMIT 2
      |), slice AS (
      |  SELECT d.doc_id, d.n_chars, t.which FROM docs d JOIN top2 t USING (source)
      |), obs AS (
      |  SELECT max(CASE WHEN which = 1 THEN n END) AS n_a,
      |    max(CASE WHEN which = 2 THEN n END) AS n_b,
      |    CAST(round(CAST(
      |      CAST(max(CASE WHEN which = 1 THEN s END) AS DOUBLE) / max(CASE WHEN which = 1 THEN n END)
      |      - CAST(max(CASE WHEN which = 2 THEN s END) AS DOUBLE) / max(CASE WHEN which = 2 THEN n END)
      |      AS DECIMAL(18,8)), 6) AS DOUBLE) AS obs_diff
      |  FROM (SELECT which, count(*) AS n, sum(n_chars) AS s FROM slice GROUP BY 1)
      |), perms AS (
      |  SELECT b,
      |    CAST(round(CAST(
      |      CAST(max(CASE WHEN lbl = 0 THEN s END) AS DOUBLE) / max(CASE WHEN lbl = 0 THEN n END)
      |      - CAST(max(CASE WHEN lbl = 1 THEN s END) AS DOUBLE) / max(CASE WHEN lbl = 1 THEN n END)
      |      AS DECIMAL(18,8)), 6) AS DOUBLE) AS stat
      |  FROM (
      |    SELECT g.b, ('0x' || substring(md5(CAST(s.doc_id * 1009 + g.b AS VARCHAR)), 1, 8))::BIGINT % 2 AS lbl,
      |      count(*) AS n, sum(s.n_chars) AS s
      |    FROM slice s CROSS JOIN (SELECT unnest(generate_series(1, $PermB)) AS b) g
      |    GROUP BY 1, 2
      |  ) GROUP BY b
      |)
      |SELECT o.n_a, o.n_b, o.obs_diff, $PermB AS b_perms,
      |  CAST(sum(CASE WHEN abs(p.stat) >= abs(o.obs_diff) THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
      |  CAST(round(CAST(CAST(sum(CASE WHEN abs(p.stat) >= abs(o.obs_diff) THEN 1 ELSE 0 END) + 1 AS DOUBLE)
      |    / ($PermB + 1) AS DECIMAL(18,8)), 6) AS DOUBLE) AS p_value
      |FROM perms p, obs o
      |GROUP BY o.n_a, o.n_b, o.obs_diff""".stripMargin

  // ---------------------------------------------------------------
  // Difference-in-differences readout — the quasi-experimental
  // companion to events_ab_cuped: arms assigned by the same md5 user
  // hash, periods split at the time midpoint, and the DiD estimate
  // (m̂₁₁ − m̂₁₀) − (m̂₀₁ − m̂₀₀) removes both the arm-level and the
  // period-level additive biases a naive post-period comparison keeps.
  // SE is the four-cell pooled form sqrt(Σ s²ᵢ/nᵢ).
  //
  // Scale shape: ONE pass reduces the corpus to FOUR cells of
  // DECIMAL-snapped moments (n, Σv, Σv² per arm × period, map-side
  // combinable); the readout is scalar math on one row. Determinism:
  // the CUPED discipline — integer/DECIMAL sums, each derived double
  // snapped before the next step.
  private def didReadout(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).withColumn("sec", col("ts").cast("long"))
    val bound = e.agg(((min(col("sec")) + max(col("sec"))) / 2).cast("long").as("mid"))
    val cells = e.crossJoin(broadcast(bound))
      .withColumn("arm",
        expr("cast(conv(substring(md5(cast(user_id AS string)), 1, 8), 16, 10) AS bigint) % 2"))
      .withColumn("post", when(col("sec") >= col("mid"), 1L).otherwise(0L))
      .groupBy(col("arm"), col("post"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).as("s1"),
        sum(dec(col("value") * col("value"))).as("s2"))
    def cell(c: String, a: Int, p: Int): Column =
      max(when(col("arm") === a && col("post") === p, col(c)))
    val wide = cells.agg(
      cell("n", 0, 0).as("n00"), cell("n", 0, 1).as("n01"),
      cell("n", 1, 0).as("n10"), cell("n", 1, 1).as("n11"),
      cell("s1", 0, 0).cast("double").as("a00"), cell("s1", 0, 1).cast("double").as("a01"),
      cell("s1", 1, 0).cast("double").as("a10"), cell("s1", 1, 1).cast("double").as("a11"),
      cell("s2", 0, 0).cast("double").as("q00"), cell("s2", 0, 1).cast("double").as("q01"),
      cell("s2", 1, 0).cast("double").as("q10"), cell("s2", 1, 1).cast("double").as("q11"))
    def mean(s: String, n: String): Column = rnd(col(s) / col(n), 6)
    def varTerm(q: String, s: String, n: String): Column =
      (col(q) - col(s) * col(s) / col(n)) / (col(n) - 1) / col(n)
    wide
      .withColumn("m00", mean("a00", "n00")).withColumn("m01", mean("a01", "n01"))
      .withColumn("m10", mean("a10", "n10")).withColumn("m11", mean("a11", "n11"))
      .withColumn("did", rnd(
        col("m11") - col("m10") - (col("m01") - col("m00")), 6))
      .withColumn("se", rnd(sqrt(
        varTerm("q00", "a00", "n00") + varTerm("q01", "a01", "n01")
          + varTerm("q10", "a10", "n10") + varTerm("q11", "a11", "n11")), 6))
      .withColumn("t_stat", rnd(col("did") / col("se"), 4))
      .select(col("n00"), col("n01"), col("n10"), col("n11"),
        col("m00"), col("m01"), col("m10"), col("m11"),
        col("did"), col("se"), col("t_stat"))
  }

  private val didReadoutSql =
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts)//1000000000 AS sec, value FROM events
      |), bound AS (
      |  SELECT (min(sec) + max(sec)) // 2 AS mid FROM e
      |), cells AS (
      |  SELECT ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS arm,
      |    CASE WHEN sec >= b.mid THEN 1 ELSE 0 END AS post,
      |    count(*) AS n,
      |    sum(CAST(value AS DECIMAL(18,4))) AS s1,
      |    sum(CAST(value * value AS DECIMAL(18,4))) AS s2
      |  FROM e, bound b GROUP BY 1, 2
      |), wide AS (
      |  SELECT
      |    max(CASE WHEN arm = 0 AND post = 0 THEN n END) AS n00,
      |    max(CASE WHEN arm = 0 AND post = 1 THEN n END) AS n01,
      |    max(CASE WHEN arm = 1 AND post = 0 THEN n END) AS n10,
      |    max(CASE WHEN arm = 1 AND post = 1 THEN n END) AS n11,
      |    CAST(max(CASE WHEN arm = 0 AND post = 0 THEN s1 END) AS DOUBLE) AS a00,
      |    CAST(max(CASE WHEN arm = 0 AND post = 1 THEN s1 END) AS DOUBLE) AS a01,
      |    CAST(max(CASE WHEN arm = 1 AND post = 0 THEN s1 END) AS DOUBLE) AS a10,
      |    CAST(max(CASE WHEN arm = 1 AND post = 1 THEN s1 END) AS DOUBLE) AS a11,
      |    CAST(max(CASE WHEN arm = 0 AND post = 0 THEN s2 END) AS DOUBLE) AS q00,
      |    CAST(max(CASE WHEN arm = 0 AND post = 1 THEN s2 END) AS DOUBLE) AS q01,
      |    CAST(max(CASE WHEN arm = 1 AND post = 0 THEN s2 END) AS DOUBLE) AS q10,
      |    CAST(max(CASE WHEN arm = 1 AND post = 1 THEN s2 END) AS DOUBLE) AS q11
      |  FROM cells
      |), m AS (
      |  SELECT *,
      |    CAST(round(CAST(a00 / n00 AS DECIMAL(18,8)), 6) AS DOUBLE) AS m00,
      |    CAST(round(CAST(a01 / n01 AS DECIMAL(18,8)), 6) AS DOUBLE) AS m01,
      |    CAST(round(CAST(a10 / n10 AS DECIMAL(18,8)), 6) AS DOUBLE) AS m10,
      |    CAST(round(CAST(a11 / n11 AS DECIMAL(18,8)), 6) AS DOUBLE) AS m11
      |  FROM wide
      |)
      |SELECT n00, n01, n10, n11, m00, m01, m10, m11,
      |  CAST(round(CAST(m11 - m10 - (m01 - m00) AS DECIMAL(18,8)), 6) AS DOUBLE) AS did,
      |  CAST(round(CAST(sqrt(
      |      (q00 - a00 * a00 / n00) / (n00 - 1) / n00
      |    + (q01 - a01 * a01 / n01) / (n01 - 1) / n01
      |    + (q10 - a10 * a10 / n10) / (n10 - 1) / n10
      |    + (q11 - a11 * a11 / n11) / (n11 - 1) / n11
      |  ) AS DECIMAL(18,8)), 6) AS DOUBLE) AS se,
      |  CAST(round(CAST(
      |    CAST(round(CAST(m11 - m10 - (m01 - m00) AS DECIMAL(18,8)), 6) AS DOUBLE)
      |    / CAST(round(CAST(sqrt(
      |        (q00 - a00 * a00 / n00) / (n00 - 1) / n00
      |      + (q01 - a01 * a01 / n01) / (n01 - 1) / n01
      |      + (q10 - a10 * a10 / n10) / (n10 - 1) / n10
      |      + (q11 - a11 * a11 / n11) / (n11 - 1) / n11
      |    ) AS DECIMAL(18,8)), 6) AS DOUBLE)
      |    AS DECIMAL(18,8)), 4) AS DOUBLE) AS t_stat
      |FROM m""".stripMargin
}
