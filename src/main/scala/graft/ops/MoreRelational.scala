package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Registry.{dec, sumDec2, rnd}
import Tables.table

/** Round-2 widening of the §2.6 capability inventory: more TPC-H-shaped
  * join/agg plans (existence joins, conditional aggregation, disjunctive
  * predicate pushdown, having-join), statistical and percentile
  * aggregates, additional window functions, a theta join, and the
  * remaining scalar families (conditional, bitwise, regexp).
  *
  * Same scale rules as [[Relational]]: joins key on the natural key,
  * dimensions broadcast, doubles aggregate through DECIMAL for
  * cross-engine determinism, explicit NULLS ordering on both engines.
  */
object MoreRelational {

  def queries: Vector[NamedQuery] = Vector(
    NamedQuery("q4_priority_late_ship", q4, Some(q4Sql)),
    NamedQuery("q10_returned_revenue", q10, Some(q10Sql)),
    NamedQuery("q12_late_lines_by_status", q12, Some(q12Sql)),
    NamedQuery("q14_promo_revenue", q14, Some(q14Sql)),
    NamedQuery("q18_large_orders", q18, Some(q18Sql)),
    NamedQuery("q19_bracket_revenue", q19, Some(q19Sql)),
    NamedQuery("agg_stats_funcs", aggStats, Some(aggStatsSql)),
    NamedQuery("agg_percentiles", aggPercentiles, Some(aggPercentilesSql)),
    NamedQuery("agg_percentiles_approx", aggPercentilesApprox, Some(aggPercentilesApproxSql)),
    NamedQuery("win_rank_funcs", winRank, Some(winRankSql)),
    NamedQuery("join_theta_linepairs", thetaPairs, Some(thetaPairsSql)),
    NamedQuery("agg_salted_hot_keys", saltedHotKeys, Some(saltedHotKeysSql)),
    NamedQuery("join_full_outer_counts", fullOuter, Some(fullOuterSql)),
    NamedQuery("setop_except_all", exceptAll, Some(exceptAllSql)),
    NamedQuery("setop_intersect_all", intersectAll, Some(intersectAllSql)),
    NamedQuery("agg_bool_funcs", aggBool, Some(aggBoolSql)),
    NamedQuery("scalar_map_funcs", scalarMap, Some(scalarMapSql)),
    NamedQuery("agg_unpivot_measures", unpivotMeasures, Some(unpivotMeasuresSql)),
    NamedQuery("sql_correlated_subquery", correlatedSubquery, Some(correlatedSubquerySql)),
    NamedQuery("win_range_interval", winRangeInterval, Some(winRangeIntervalSql)),
    NamedQuery("scalar_datetrunc_funcs", dateTrunc, Some(dateTruncSql)),
    NamedQuery("explode_outer_types", explodeOuter, Some(explodeOuterSql)),
    NamedQuery("agg_string_agg", stringAgg, Some(stringAggSql)),
    NamedQuery("scalar_conditional_funcs", scalarCond, Some(scalarCondSql)),
    NamedQuery("scalar_bitwise_funcs", scalarBitwise, Some(scalarBitwiseSql)),
    NamedQuery("scalar_regexp_funcs", scalarRegexp, Some(scalarRegexpSql)),
    NamedQuery("sql_recursive_cte", recursiveCte, Some(recursiveCteSql)),
    NamedQuery("join_lateral_topn", lateralTopN, Some(lateralTopNSql)),
    NamedQuery("agg_approx_topk", approxTopK, Some(approxTopKSql)),
    NamedQuery("events_funnel_steps", funnelSteps, Some(funnelStepsSql)),
    NamedQuery("events_retention_cohorts", retentionCohorts, Some(retentionCohortsSql)),
    NamedQuery("agg_histogram", histogram, Some(histogramSql)),
    NamedQuery("events_activity_streaks", activityStreaks, Some(activityStreaksSql)),
    NamedQuery("events_transitions", transitions, Some(transitionsSql)),
    NamedQuery("events_anomaly_zscore", anomalyZscore, Some(anomalyZscoreSql)),
    NamedQuery("events_attribution_last_touch", attributionLastTouch, Some(attributionLastTouchSql)),
    NamedQuery("agg_mad_robust", madRobust, Some(madRobustSql)),
    NamedQuery("events_time_weighted_avg", timeWeightedAvg, Some(timeWeightedAvgSql)),
    NamedQuery("events_top_paths", topPaths, Some(topPathsSql)),
    NamedQuery("audit_referential", auditReferential, Some(auditReferentialSql)),
    NamedQuery("graph_pagerank_step", pagerankStep, Some(pagerankStepSql)),
    NamedQuery("agg_decay_halflife", decayHalflife, Some(decayHalflifeSql)),
    NamedQuery("join_fuzzy_match", fuzzyMatch, Some(fuzzyMatchSql)),
    NamedQuery("scalar_url_funcs", scalarUrl, Some(scalarUrlSql)),
    NamedQuery("dedup_fuzzy_clusters", fuzzyClusters, Some(fuzzyClustersSql)),
    NamedQuery("dedup_er_threshold_sweep", erThresholdSweep, Some(erThresholdSweepSql)),
    NamedQuery("agg_weighted_median", weightedMedian, Some(weightedMedianSql)),
  )

  // ---------------------------------------------------------------
  // Recursive CTE (Spark 4 WITH RECURSIVE): walk the region -> nation
  // -> customer containment hierarchy as a genuine edge-list recursion.
  // Each iteration is one join against the previous frontier — Spark
  // executes it as iterative union steps, exactly the way a recursive
  // query scales (per-level joins, no unbounded driver loop).
  private def recursiveCte(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "region").createOrReplaceTempView("region_rc")
    table(spark, dir, "nation").createOrReplaceTempView("nation_rc")
    table(spark, dir, "customer").createOrReplaceTempView("customer_rc")
    spark.sql(
      """WITH RECURSIVE walk(node, lvl) AS (
        |  SELECT concat('R', CAST(r_regionkey AS STRING)), 0 FROM region_rc
        |  UNION ALL
        |  SELECT e.child, w.lvl + 1
        |  FROM walk w
        |  JOIN (
        |    SELECT concat('R', CAST(n_regionkey AS STRING)) AS parent,
        |           concat('N', CAST(n_nationkey AS STRING)) AS child FROM nation_rc
        |    UNION ALL
        |    SELECT concat('N', CAST(c_nationkey AS STRING)),
        |           concat('C', CAST(c_custkey AS STRING)) FROM customer_rc
        |  ) e ON e.parent = w.node
        |)
        |SELECT node, lvl FROM walk ORDER BY lvl, node""".stripMargin)
  }

  private val recursiveCteSql =
    """WITH RECURSIVE walk(node, lvl) AS (
      |  SELECT concat('R', CAST(r_regionkey AS VARCHAR)), 0 FROM region
      |  UNION ALL
      |  SELECT e.child, w.lvl + 1
      |  FROM walk w
      |  JOIN (
      |    SELECT concat('R', CAST(n_regionkey AS VARCHAR)) AS parent,
      |           concat('N', CAST(n_nationkey AS VARCHAR)) AS child FROM nation
      |    UNION ALL
      |    SELECT concat('N', CAST(c_nationkey AS VARCHAR)),
      |           concat('C', CAST(c_custkey AS VARCHAR)) FROM customer
      |  ) e ON e.parent = w.node
      |)
      |SELECT node, CAST(lvl AS INT) AS lvl FROM walk ORDER BY lvl, node""".stripMargin

  // ---------------------------------------------------------------
  // Correlated LATERAL subquery with LIMIT: per-group top-N without a
  // window function — the decorrelation plans one ranked join, not a
  // per-group re-scan.
  private def lateralTopN(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "customer").createOrReplaceTempView("customer_lat")
    spark.sql(
      """SELECT s.c_mktsegment, l.c_custkey, l.c_acctbal
        |FROM (SELECT DISTINCT c_mktsegment FROM customer_lat) s,
        |LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer_lat c
        |  WHERE c.c_mktsegment = s.c_mktsegment
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 3
        |) l
        |ORDER BY s.c_mktsegment, l.c_acctbal DESC, l.c_custkey""".stripMargin)
  }

  private val lateralTopNSql =
    """SELECT s.c_mktsegment, l.c_custkey, l.c_acctbal
      |FROM (SELECT DISTINCT c_mktsegment FROM customer) s,
      |LATERAL (
      |  SELECT c_custkey, c_acctbal FROM customer c
      |  WHERE c.c_mktsegment = s.c_mktsegment
      |  ORDER BY c_acctbal DESC, c_custkey LIMIT 3
      |) l
      |ORDER BY s.c_mktsegment, l.c_acctbal DESC, l.c_custkey""".stripMargin

  // ---------------------------------------------------------------
  // q4 (TPC-H Q4 shape): existence semi-join — orders having at least
  // one line shipped > 60 days after the order date, counted by
  // priority. The semi-join shuffles on orderkey; the count is a
  // broadcast-size result.
  private def q4(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
    val late = table(spark, dir, "lineitem")
      .join(o.select(col("o_orderkey").as("k"), col("o_orderdate")),
        col("l_orderkey") === col("k"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("l_orderkey")).distinct()
    o.join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  private val q4Sql =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey
      |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------
  // q10 (TPC-H Q10 shape): revenue lost to returned items per customer,
  // top 20 — join + agg + TakeOrderedAndProject.
  private def q10(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
      .join(table(spark, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .join(table(spark, dir, "lineitem").filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(round(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec(col("l_discount")))), 2)
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  private val q10Sql =
    """SELECT c_custkey, c_name,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_returnflag = 'R'
      |GROUP BY c_custkey, c_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------
  // q12 (TPC-H Q12 shape): conditional aggregation over a join — late
  // lines per linestatus split into high/low priority counts.
  private def q12(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .join(table(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("low_line_count"))
      .orderBy(col("l_linestatus"))

  private val q12Sql =
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  // ---------------------------------------------------------------
  // q14 (TPC-H Q14 shape): promo revenue share — two DECIMAL sums, the
  // ratio computed on the rounded doubles so both engines divide the
  // same values. part broadcasts (dimension).
  private def q14(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .join(broadcast(table(spark, dir, "part")), col("l_partkey") === col("p_partkey"))
      .agg(
        round(sum(when(col("p_type") === "PROMO",
            dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec(col("l_discount"))))
          .otherwise(lit(0).cast("decimal(18,4)"))), 2).cast("double").as("promo_revenue"),
        round(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec(col("l_discount")))), 2)
          .cast("double").as("total_revenue"))
      .withColumn("promo_pct", rnd(lit(100.0) * col("promo_revenue") / col("total_revenue"), 4))

  private val q14Sql =
    """WITH s AS (
      |  SELECT
      |    CAST(round(sum(CASE WHEN p_type = 'PROMO'
      |      THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
      |      ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS promo_revenue,
      |    CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS total_revenue
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |)
      |SELECT promo_revenue, total_revenue,
      |  CAST(round(CAST(100.0 * promo_revenue / total_revenue AS DECIMAL(18,8)), 4) AS DOUBLE) AS promo_pct
      |FROM s""".stripMargin

  // ---------------------------------------------------------------
  // q18 (TPC-H Q18 shape): having-join — customers whose orders exceed
  // 200 total quantity. The having aggregate runs BEFORE the join (small
  // surviving set), then joins back to orders/customer.
  private def q18(spark: SparkSession, dir: String): DataFrame = {
    val big = table(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sumDec2(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 200.0)
    table(spark, dir, "orders")
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(table(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(50)
  }

  private val q18Sql =
    """SELECT c_custkey, c_name, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_totalprice, total_qty
      |FROM orders
      |JOIN (
      |  SELECT l_orderkey AS lk,
      |    CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) > 200.0
      |) ON o_orderkey = lk
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 50""".stripMargin

  // ---------------------------------------------------------------
  // q19 (TPC-H Q19 shape): disjunctive bracket predicates — Catalyst
  // extracts the common p_partkey equi-key and pushes the residual OR
  // below the join where possible.
  private def q19(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .join(broadcast(table(spark, dir, "part")), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size") <= 10 && col("l_quantity") >= 20) ||
        (col("p_brand") === "Brand#2" && col("p_size") <= 20 && col("l_quantity") >= 10) ||
        (col("p_type") === "PROMO" && col("l_quantity") >= 30))
      .agg(round(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec(col("l_discount")))), 2)
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))

  private val q19Sql =
    """SELECT
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity >= 20)
      |   OR (p_brand = 'Brand#2' AND p_size <= 20 AND l_quantity >= 10)
      |   OR (p_type = 'PROMO' AND l_quantity >= 30)""".stripMargin

  // ---------------------------------------------------------------
  // Statistical aggregates: sample stddev/variance, correlation and
  // sample covariance of quantity vs extendedprice per returnflag.
  // These accumulate in floating point in both engines; values are
  // O(1e2..1e7) and both engines use numerically-stable one-pass
  // updates, so rounding at 2-4 decimals is deterministic in practice.
  private def aggStats(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        rnd(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        rnd(var_samp(col("l_quantity")), 4).as("var_qty"),
        rnd(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
        rnd(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_qty_price"))
      .orderBy(col("l_returnflag"))

  private val aggStatsSql =
    """SELECT l_returnflag,
      |  CAST(round(CAST(stddev_samp(l_quantity) AS DECIMAL(18,8)), 4) AS DOUBLE) AS sd_qty,
      |  CAST(round(CAST(var_samp(l_quantity) AS DECIMAL(18,8)), 4) AS DOUBLE) AS var_qty,
      |  CAST(round(CAST(corr(l_quantity, l_extendedprice) AS DECIMAL(18,8)), 4) AS DOUBLE) AS corr_qty_price,
      |  CAST(round(CAST(covar_samp(l_quantity, l_extendedprice) AS DECIMAL(18,8)), 2) AS DOUBLE) AS covar_qty_price
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------
  // Exact percentiles (linear interpolation — Spark `percentile` ==
  // DuckDB `quantile_cont`) of order totals per status.
  private def aggPercentiles(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        rnd(expr("percentile(o_totalprice, 0.25)"), 2).as("p25"),
        rnd(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        rnd(expr("percentile(o_totalprice, 0.75)"), 2).as("p75"),
        rnd(expr("percentile(o_totalprice, 0.95)"), 2).as("p95"))
      .orderBy(col("o_orderstatus"))

  private val aggPercentilesSql =
    """SELECT o_orderstatus,
      |  CAST(round(CAST(quantile_cont(o_totalprice, 0.25) AS DECIMAL(18,8)), 2) AS DOUBLE) AS p25,
      |  CAST(round(CAST(quantile_cont(o_totalprice, 0.5) AS DECIMAL(18,8)), 2) AS DOUBLE) AS p50,
      |  CAST(round(CAST(quantile_cont(o_totalprice, 0.75) AS DECIMAL(18,8)), 2) AS DOUBLE) AS p75,
      |  CAST(round(CAST(quantile_cont(o_totalprice, 0.95) AS DECIMAL(18,8)), 2) AS DOUBLE) AS p95
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------
  // approx_percentile twin of agg_percentiles — the 100 TB form. Exact
  // grouped `percentile` is a TypedImperativeAggregate that BUFFERS the
  // group's values: fine at bench scale, but at 100 TB a percentile
  // over billions of rows per group holds the group in memory. The
  // KLL/GK-style `approx_percentile` sketch is the production shape:
  // fixed-size state, map-side partial sketches merged at the final
  // agg (plan-pinned in PlanSpec: partial ObjectHashAggregate, no Sort
  // before the aggregate, no global sort anywhere). Oracle discipline
  // is agg_approx_sketches': the exact columns hash-check against
  // DuckDB's quantile_cont, the sketch answers are asserted
  // in-tolerance as booleans (accuracy=10000 bounds rank error at
  // 1e-4·n — orders of magnitude tighter than the 1%+1.0 gate, so the
  // booleans are stable across engines and scale factors). A
  // deployment keeps only the sketch columns.
  private def aggPercentilesApprox(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        rnd(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        rnd(expr("percentile(o_totalprice, 0.95)"), 2).as("p95"),
        percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("ap50"),
        percentile_approx(col("o_totalprice"), lit(0.95), lit(10000)).as("ap95"))
      .select(col("o_orderstatus"), col("n"), col("p50"), col("p95"),
        (abs(col("ap50") - col("p50")) <= col("p50") * 0.01 + 1.0).as("ap50_ok"),
        (abs(col("ap95") - col("p95")) <= col("p95") * 0.01 + 1.0).as("ap95_ok"))
      .orderBy(col("o_orderstatus"))

  private val aggPercentilesApproxSql =
    """SELECT o_orderstatus, count(*) AS n,
      |  CAST(round(CAST(quantile_cont(o_totalprice, 0.5) AS DECIMAL(18,8)), 2) AS DOUBLE) AS p50,
      |  CAST(round(CAST(quantile_cont(o_totalprice, 0.95) AS DECIMAL(18,8)), 2) AS DOUBLE) AS p95,
      |  TRUE AS ap50_ok,
      |  TRUE AS ap95_ok
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------
  // Window functions round 2: dense_rank, cume_dist, nth_value with an
  // explicit whole-partition frame (default frames differ across
  // engines, so both sides pin it).
  private def winRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    table(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        dense_rank().over(w).as("dr"),
        rnd(cume_dist().over(w), 6).as("cd"),
        nth_value(col("o_orderkey"), 2).over(wFull).as("second_best"))
      .orderBy(col("o_custkey"), col("dr"), col("o_orderkey"))
  }

  private val winRankSql =
    """SELECT o_custkey, o_orderkey,
      |  dense_rank() OVER w AS dr,
      |  CAST(round(CAST(cume_dist() OVER w AS DECIMAL(18,8)), 6) AS DOUBLE) AS cd,
      |  nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
      |    ORDER BY o_totalprice DESC, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_best
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_custkey, dr, o_orderkey""".stripMargin

  // ---------------------------------------------------------------
  // Theta join: same-order line pairs (equi on orderkey + inequality on
  // linenumber) — the pair space is bounded by lines-per-order, so the
  // "theta" part runs inside the equi-join's hash bucket, never as a
  // cartesian product.
  private def thetaPairs(spark: SparkSession, dir: String): DataFrame = {
    val l = table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    // the planner broadcasts the b side (BHJ, no shuffle) — correct —
    // but the probe side is then the raw single-row-group scan, so the
    // whole per-bucket pair expansion ran in ONE task; spread the probe
    // by the join key so the BHJ and the per-order aggregation run
    // across the pool with no further exchange (guide §2.5/§3.1)
    val a = Tables.fanOut(l, "l_orderkey")
      .select(col("l_orderkey").as("k"), col("l_linenumber").as("ln_a"), col("l_extendedprice").as("pa"))
    val b = l.select(col("l_orderkey").as("k2"), col("l_linenumber").as("ln_b"), col("l_extendedprice").as("pb"))
    a.join(b, col("k") === col("k2") && col("ln_a") < col("ln_b"))
      .groupBy(col("k").as("o_orderkey"))
      .agg(count(lit(1)).as("n_pairs"),
        rnd(max(abs(dec(col("pa")) - dec(col("pb")))), 2).as("max_price_gap"))
      .orderBy(col("o_orderkey"))
  }

  private val thetaPairsSql =
    """SELECT a.l_orderkey AS o_orderkey, count(*) AS n_pairs,
      |  CAST(round(CAST(max(abs(CAST(a.l_extendedprice AS DECIMAL(18,4)) - CAST(b.l_extendedprice AS DECIMAL(18,4)))) AS DECIMAL(18,8)), 2) AS DOUBLE) AS max_price_gap
      |FROM lineitem a JOIN lineitem b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
      |GROUP BY a.l_orderkey
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------
  // Skew-safe aggregation as a first-class operator: event_type has 5
  // values over the whole corpus — the classic hot-key shape where a
  // plain groupBy funnels everything through 5 reducers. The two-level
  // salted aggregation ([[Salting.saltedSum]]) spreads each hot key over
  // `saltFactor` sub-keys before the final combine; the value column is
  // pre-cast to DECIMAL so partial-sum order cannot change the result
  // and the oracle's plain sum matches exactly.
  private def saltedHotKeys(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).withColumn("v", dec(col("value")))
    Salting.saltedSum(ev.select(col("event_type"), col("v")), "event_type", "v", 8)
      .select(col("event_type"), round(col("sum_v"), 2).cast("double").as("total_value"))
      .orderBy(col("event_type"))
  }

  private val saltedHotKeysSql =
    """SELECT event_type,
      |  CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------
  // Full outer join: nations x order-customer nations — rows survive
  // from both sides with nulls on the unmatched side.
  private def fullOuter(spark: SparkSession, dir: String): DataFrame = {
    val custNations = table(spark, dir, "customer")
      .join(table(spark, dir, "orders").filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_closed_orders"))
    table(spark, dir, "nation")
      .join(custNations, col("n_nationkey") === col("c_nationkey"), "full_outer")
      .select(col("n_name"), coalesce(col("n_closed_orders"), lit(0L)).as("n_closed_orders"))
      .orderBy(col("n_name").asc_nulls_first)
  }

  private val fullOuterSql =
    """WITH cn AS (
      |  SELECT c_nationkey, count(*) AS n_closed_orders
      |  FROM customer JOIN orders ON c_custkey = o_custkey
      |  WHERE o_orderstatus = 'F'
      |  GROUP BY c_nationkey
      |)
      |SELECT n_name, coalesce(n_closed_orders, 0) AS n_closed_orders
      |FROM nation FULL OUTER JOIN cn ON n_nationkey = c_nationkey
      |ORDER BY n_name ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------
  // Bag-semantics set ops: EXCEPT ALL / INTERSECT ALL preserve
  // multiplicity (the DISTINCT forms are covered by setop_except/
  // setop_intersect).
  private def exceptAll(spark: SparkSession, dir: String): DataFrame = {
    val open = table(spark, dir, "orders").filter(col("o_orderstatus") === "O")
      .select(col("o_custkey"))
    val urgent = table(spark, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    open.exceptAll(urgent)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("multiplicity"))
      .orderBy(col("o_custkey"))
  }

  private val exceptAllSql =
    """SELECT o_custkey, count(*) AS multiplicity FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |  EXCEPT ALL
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |)
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  private def intersectAll(spark: SparkSession, dir: String): DataFrame = {
    val open = table(spark, dir, "orders").filter(col("o_orderstatus") === "O")
      .select(col("o_custkey"))
    val urgent = table(spark, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    open.intersectAll(urgent)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("multiplicity"))
      .orderBy(col("o_custkey"))
  }

  private val intersectAllSql =
    """SELECT o_custkey, count(*) AS multiplicity FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |  INTERSECT ALL
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |)
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------
  // Boolean / conditional-count aggregates.
  private def aggBool(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("bool_and(o_totalprice > 1000)").as("all_over_1k"),
        expr("bool_or(o_totalprice > 400000)").as("any_over_400k"),
        expr("count_if(o_orderpriority = '1-URGENT')").as("n_urgent"))
      .orderBy(col("o_orderstatus"))

  private val aggBoolSql =
    """SELECT o_orderstatus,
      |  bool_and(o_totalprice > 1000) AS all_over_1k,
      |  bool_or(o_totalprice > 400000) AS any_over_400k,
      |  CAST(count_if(o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------
  // Conditional scalar functions: coalesce / nullif / greatest / least /
  // CASE over order attributes.
  private def scalarCond(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_or_open"),
        rnd(greatest(dec(col("o_totalprice")), lit(100000).cast("decimal(18,4)")), 2).as("floor_100k"),
        rnd(least(dec(col("o_totalprice")), lit(200000).cast("decimal(18,4)")), 2).as("cap_200k"),
        when(col("o_totalprice") > 150000, "big").otherwise("small").as("bucket"))
      .orderBy(col("o_orderkey"))

  private val scalarCondSql =
    """SELECT o_orderkey,
      |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
      |  CAST(round(CAST(greatest(CAST(o_totalprice AS DECIMAL(18,4)), CAST(100000 AS DECIMAL(18,4))) AS DECIMAL(18,8)), 2) AS DOUBLE) AS floor_100k,
      |  CAST(round(CAST(least(CAST(o_totalprice AS DECIMAL(18,4)), CAST(200000 AS DECIMAL(18,4))) AS DECIMAL(18,8)), 2) AS DOUBLE) AS cap_200k,
      |  CASE WHEN o_totalprice > 150000 THEN 'big' ELSE 'small' END AS bucket
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------
  // Bitwise scalar functions on integer keys (DuckDB spells xor as a
  // function and exponentiation as ^, hence the twin's xor()).
  private def scalarBitwise(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "part")
      .select(
        col("p_partkey"),
        expr("p_partkey & 255").as("low_byte"),
        expr("p_partkey | 4096").as("with_flag"),
        expr("p_partkey ^ 21845").as("xored"),
        expr("shiftleft(p_partkey, 3)").as("shl3"),
        expr("shiftright(p_partkey, 2)").as("shr2"))
      .orderBy(col("p_partkey"))

  private val scalarBitwiseSql =
    """SELECT p_partkey,
      |  p_partkey & 255 AS low_byte,
      |  p_partkey | 4096 AS with_flag,
      |  xor(p_partkey, 21845) AS xored,
      |  p_partkey << 3 AS shl3,
      |  p_partkey >> 2 AS shr2
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------
  // Map functions over the dynamic-document column: the props JSON
  // parses to map<string,string> and the map family (keys, size,
  // element_at) operates on it — the fixed-schema face of the engine's
  // schemaless-document handling. Key order is pinned by sorting.
  private def scalarMap(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("m", from_json(col("props"), org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType)))
      .select(
        col("event_id"),
        size(col("m")).cast("long").as("n_keys"),
        concat_ws(",", sort_array(map_keys(col("m")))).as("keys_sorted"),
        element_at(col("m"), "k").as("k_value"))
      .orderBy(col("event_id"))

  private val scalarMapSql =
    """SELECT event_id,
      |  CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
      |  array_to_string(list_sort(json_keys(props)), ',') AS keys_sorted,
      |  props->>'$.k' AS k_value
      |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------
  // Unpivot (the inverse of pivot): lineitem's four measures become
  // (measure, val) rows via Dataset.unpivot — Catalyst's Expand, one
  // scan, no join — then aggregate per measure. The oracle rebuilds it
  // as UNION ALL, which is exactly what Expand computes.
  private def unpivotMeasures(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .select(col("l_orderkey"), dec(col("l_quantity")).as("quantity"),
        dec(col("l_extendedprice")).as("extendedprice"),
        dec(col("l_discount")).as("discount"), dec(col("l_tax")).as("tax"))
      .unpivot(
        ids = Array(col("l_orderkey")),
        values = Array(col("quantity"), col("extendedprice"), col("discount"), col("tax")),
        variableColumnName = "measure",
        valueColumnName = "val")
      .groupBy(col("measure"))
      .agg(round(sum(col("val")), 2).cast("double").as("total"),
        count(lit(1)).as("n"))
      .orderBy(col("measure"))

  private val unpivotMeasuresSql =
    """SELECT measure,
      |  CAST(round(sum(CAST(v AS DECIMAL(18,4))), 2) AS DOUBLE) AS total,
      |  count(*) AS n
      |FROM (
      |  SELECT 'quantity' AS measure, l_quantity AS v FROM lineitem
      |  UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem
      |  UNION ALL SELECT 'discount', l_discount FROM lineitem
      |  UNION ALL SELECT 'tax', l_tax FROM lineitem
      |)
      |GROUP BY measure ORDER BY measure""".stripMargin

  // ---------------------------------------------------------------
  // Correlated scalar subquery through the SQL surface: orders from
  // prolific customers — the inner count correlates on o_custkey.
  // Catalyst decorrelates this into an aggregate + join; the count is
  // exact integers, so no float parity concerns.
  private def correlatedSubquery(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "orders").createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o_orderkey, o_custkey
        |FROM orders_v o
        |WHERE (SELECT count(*) FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey) > 15
        |ORDER BY o_orderkey""".stripMargin)
  }

  private val correlatedSubquerySql =
    """SELECT o_orderkey, o_custkey
      |FROM orders o
      |WHERE (SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey) > 15
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------
  // Event-time RANGE frame with an interval bound: per customer, how
  // many orders landed in the trailing 30 days (including this one) —
  // the sliding-window-over-time shape as a window frame.
  private def winRangeInterval(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "orders").createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o_orderkey, o_custkey,
        |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS orders_30d
        |FROM orders_v
        |ORDER BY o_orderkey""".stripMargin)
  }

  private val winRangeIntervalSql =
    """SELECT o_orderkey, o_custkey,
      |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
      |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS orders_30d
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------
  // Date truncation / calendar parts (the safe cross-engine subset:
  // week numbering and dayofweek origins differ between engines and are
  // deliberately excluded).
  private def dateTrunc(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        date_format(date_trunc("quarter", col("o_orderdate")), "yyyy-MM-dd").as("quarter_start"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        dayofmonth(col("o_orderdate")).as("dom"))
      .orderBy(col("o_orderkey"))

  private val dateTruncSql =
    """SELECT o_orderkey,
      |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
      |  strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS quarter_start,
      |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
      |  CAST(year(o_orderdate) AS INT) AS y,
      |  CAST(quarter(o_orderdate) AS INT) AS q,
      |  CAST(day(o_orderdate) AS INT) AS dom
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------
  // explode_outer: the null-preserving generator — rows whose array is
  // null survive with a null element instead of disappearing (PROMO
  // parts get a null word here). DuckDB's unnest drops empty/null
  // lists, so the twin coalesces to [NULL] — the exact explode_outer
  // contract.
  private def explodeOuter(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "part")
      .select(col("p_partkey"),
        explode_outer(split(nullif(col("p_type"), lit("PROMO")), "")).as("ch"))
      .groupBy(col("p_partkey"))
      .agg(count(lit(1)).as("n_rows"), count(col("ch")).as("n_chars"))
      .orderBy(col("p_partkey"))

  private val explodeOuterSql =
    """SELECT p_partkey, count(*) AS n_rows, count(ch) AS n_chars
      |FROM (
      |  SELECT p_partkey,
      |    unnest(coalesce(string_split(nullif(p_type, 'PROMO'), ''), [NULL])) AS ch
      |  FROM part
      |)
      |GROUP BY p_partkey ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------
  // String aggregation: order-pinned listagg per group (collect_list is
  // unordered by contract, so the sort happens inside the aggregate
  // expression on both engines).
  private def stringAgg(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "nation")
      .groupBy(col("n_regionkey"))
      .agg(concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations"),
        count(lit(1)).as("n"))
      .orderBy(col("n_regionkey"))

  private val stringAggSql =
    """SELECT n_regionkey,
      |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
      |  count(*) AS n
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  // ---------------------------------------------------------------
  // Regexp scalar functions: capture-group extraction and match
  // counting (RE2-compatible patterns so both engines agree).
  private def scalarRegexp(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "part")
      .select(
        col("p_partkey"),
        regexp_extract(col("p_brand"), "Brand#([0-9]+)", 1).cast("long").as("brand_num"),
        expr("regexp_count(p_name, '[aeiou]')").as("n_vowels"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"))
      .orderBy(col("p_partkey"))

  private val scalarRegexpSql =
    """SELECT p_partkey,
      |  CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS BIGINT) AS brand_num,
      |  len(regexp_extract_all(p_name, '[aeiou]')) AS n_vowels,
      |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------
  // Heavy hitters via the datasketches frequent-items aggregate
  // (Spark 4's approx_top_k): single partial/final aggregation whose
  // state is a fixed-size sketch, not the group-by hash map — the
  // 100 TB shape for "top items over a high-cardinality column". With
  // the column's distinct count far below the sketch capacity the
  // result is exact (no purges), so the oracle is the exact GROUP BY;
  // the explode + re-sort pins a deterministic output order either way.
  private def approxTopK(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .agg(expr("approx_top_k(event_type, 10)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("event_type"), col("e.count").as("cnt"))
      .orderBy(col("cnt").desc, col("event_type"))

  private val approxTopKSql =
    """SELECT event_type, count(*) AS cnt
      |FROM events GROUP BY event_type
      |ORDER BY cnt DESC, event_type""".stripMargin

  // ---------------------------------------------------------------
  // Sequential funnel over the event stream: per user, the earliest
  // click, the earliest view AT-OR-AFTER that click, the earliest
  // purchase within the hour after that view; a step counts users
  // whose chain reaches it. Three same-partitioning window passes — Catalyst plans
  // them over ONE user_id exchange (each step's predicate references
  // the previous step's min, so this is not a single conditional
  // aggregate) — then one global 3-row fold.
  private def funnelSteps(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("t1", min(when(col("event_type") === "click", col("ts"))).over(w))
      .withColumn("t2", min(when(col("event_type") === "view" && col("ts") >= col("t1"), col("ts"))).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" && col("ts") >= col("t2")
        && col("ts") <= col("t2") + expr("INTERVAL 1 HOUR"), col("ts"))).over(w))
      .select(col("user_id"), col("t1"), col("t2"), col("t3")).distinct()
      .agg(count(col("t1")).as("u1"), count(col("t2")).as("u2"), count(col("t3")).as("u3"))
      .selectExpr(
        "stack(3, 1L, 'click', u1, 2L, 'click>view', u2, 3L, 'click>view>purchase', u3) AS (step_no, step, users)")
      .orderBy(col("step_no"))
  }

  private val funnelStepsSql =
    """WITH a AS (
      |  SELECT user_id, min(CASE WHEN event_type = 'click' THEN ts END) AS t1
      |  FROM events GROUP BY user_id
      |), b AS (
      |  SELECT e.user_id, min(CASE WHEN e.event_type = 'view' AND e.ts >= a.t1 THEN e.ts END) AS t2
      |  FROM events e JOIN a ON e.user_id = a.user_id GROUP BY e.user_id
      |), c AS (
      |  SELECT e.user_id, min(CASE WHEN e.event_type = 'purchase'
      |    AND e.ts >= b.t2 AND e.ts <= b.t2 + INTERVAL 1 HOUR THEN e.ts END) AS t3
      |  FROM events e JOIN b ON e.user_id = b.user_id GROUP BY e.user_id
      |)
      |SELECT step_no, step, users FROM (
      |  SELECT CAST(1 AS BIGINT) AS step_no, 'click' AS step, count(t1) AS users FROM a
      |  UNION ALL SELECT 2, 'click>view', count(t2) FROM b
      |  UNION ALL SELECT 3, 'click>view>purchase', count(t3) FROM c
      |) ORDER BY step_no""".stripMargin

  // ---------------------------------------------------------------
  // Cohort retention matrix: users bucketed by first-seen week, then
  // distinct actives per (cohort week, weeks since). Both aggregates
  // and the join key on user_id, so the first exchange (groupBy user)
  // is REUSED by the join — one user_id shuffle total, then a tiny
  // final aggregate. Week arithmetic stays integral (both engines
  // truncate to Monday, so the day delta is an exact multiple of 7).
  private def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).cast("long").as("wk"))
    val firsts = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_week_sec"))
    ev.join(firsts, Seq("user_id"))
      .groupBy(col("cohort_week_sec"),
        ((col("wk") - col("cohort_week_sec")) / 604800).cast("int").as("week_no"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("cohort_week_sec"), col("week_no"))
  }

  private val retentionCohortsSql =
    """WITH ev AS (
      |  SELECT user_id,
      |    epoch_ms(CAST(date_trunc('week', ts) AS TIMESTAMP)) // 1000 AS wk
      |  FROM events
      |), f AS (
      |  SELECT user_id, min(wk) AS cohort_week_sec FROM ev GROUP BY user_id
      |)
      |SELECT cohort_week_sec,
      |  CAST((wk - cohort_week_sec) // 604800 AS INT) AS week_no,
      |  count(DISTINCT user_id) AS n_users,
      |  count(*) AS n_events
      |FROM ev JOIN f USING (user_id)
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------
  // Fixed-width histogram of extended price: the bucket id is integer
  // floor division (identical in both engines — no width_bucket, which
  // DuckDB lacks), the shuffle carries only (bucket, partial agg) so
  // the histogram is a pure map-side-combine aggregate regardless of
  // fact size.
  private def histogram(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .withColumn("bucket", floor(col("l_extendedprice") / 5000.0).cast("int"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("cnt"),
        sumDec2(col("l_extendedprice")).as("sum_price"),
        round(min(col("l_extendedprice")), 2).as("min_price"),
        round(max(col("l_extendedprice")), 2).as("max_price"))
      .orderBy(col("bucket"))

  private val histogramSql =
    """SELECT CAST(floor(l_extendedprice / 5000.0) AS INT) AS bucket,
      |  count(*) AS cnt,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_price,
      |  round(min(l_extendedprice), 2) AS min_price,
      |  round(max(l_extendedprice), 2) AS max_price
      |FROM lineitem
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  // Gaps-and-islands: each user's longest run of consecutive active
  // days. The island key is the difference-of-sequences trick
  // (day - row_number is constant within a consecutive run) — the
  // set-based formulation of what looks like an iterative problem, so
  // it runs as two window passes and two aggregates ALL on the same
  // user_id partitioning (one exchange). Dates travel as epoch-day
  // ints so neither engine's date rendering is in the hash.
  private def activityStreaks(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("d"))
    val days = Tables.events(spark, dir)
      .select(col("user_id"), datediff(to_date(col("ts")), lit("1970-01-01")).as("d"))
      .distinct()
    val streaks = days
      .withColumn("grp", col("d") - row_number().over(byUser))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).cast("int").as("len"), min(col("d")).as("start_day"), max(col("d")).as("end_day"))
    streaks
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("len").desc, col("start_day"))))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("len").as("longest_streak"), col("start_day"), col("end_day"))
      .orderBy(col("user_id"))
  }

  private val activityStreaksSql =
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INT) AS d FROM events
      |), isl AS (
      |  SELECT user_id, d,
      |    d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
      |  FROM days
      |), streaks AS (
      |  SELECT user_id, grp, CAST(count(*) AS INT) AS len,
      |    min(d) AS start_day, max(d) AS end_day
      |  FROM isl GROUP BY user_id, grp
      |)
      |SELECT user_id, len AS longest_streak, start_day, end_day FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY len DESC, start_day) AS rk
      |  FROM streaks) t
      |WHERE rk = 1
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------
  // Event-type transition matrix (first-order Markov counts): what
  // follows what, per user timeline. One lag window over the user_id
  // partitioning, then a tiny aggregate over the (from, to) pairs —
  // the behavioral-model input that funnels/sessionization don't give.
  private def transitions(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("from_type", lag(col("event_type"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("from_type"), col("to_type"))

  private val transitionsSql =
    """SELECT from_type, event_type AS to_type, count(*) AS n FROM (
      |  SELECT event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
      |  FROM events) t
      |WHERE from_type IS NOT NULL
      |GROUP BY from_type, event_type
      |ORDER BY from_type, to_type""".stripMargin

  // ---------------------------------------------------------------
  // Trailing-window z-score — the rolling-baseline anomaly shape every
  // monitoring pipeline runs: each event scored against its user's
  // previous 24 h (RANGE frame over epoch seconds, so both engines
  // build identical frames; the fixture's per-user event density makes
  // an hourly frame too sparse to ever reach 5 samples, so the day
  // frame is the smallest that yields a non-degenerate baseline at
  // every sf). Every scored row is emitted with its
  // outlier flag rather than pre-filtered — the fixture's uniform
  // values bound |z| below classic anomaly cuts, and a decision table
  // that covers every event composes downstream either way. The z
  // rounds to 1e-4 before the flag so engine ulp drift in avg/stddev
  // cannot flip it.
  private def anomalyZscore(spark: SparkSession, dir: String): DataFrame = {
    val win = Window.partitionBy(col("user_id")).orderBy(col("sec")).rangeBetween(-86400, 0)
    Tables.events(spark, dir)
      .withColumn("sec", col("ts").cast("long"))
      .withColumn("n_win", count(lit(1)).over(win))
      .withColumn("mu", avg(col("value")).over(win))
      .withColumn("sd", stddev_samp(col("value")).over(win))
      .filter(col("n_win") >= 5 && col("sd") > 0)
      .withColumn("z", rnd((col("value") - col("mu")) / col("sd"), 4))
      .select(
        col("event_id"), col("user_id"), col("value"),
        col("n_win"), col("z"),
        (abs(col("z")) >= 1.5).as("is_outlier"))
      .orderBy(col("event_id"))
  }

  private val anomalyZscoreSql =
    """WITH w AS (
      |  SELECT event_id, user_id, value,
      |    count(*) OVER win AS n_win,
      |    avg(value) OVER win AS mu,
      |    stddev_samp(value) OVER win AS sd
      |  FROM events
      |  WINDOW win AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000000000
      |                 RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
      |)
      |SELECT event_id, user_id, value, n_win,
      |  CAST(round(CAST((value - mu) / sd AS DECIMAL(18,8)), 4) AS DOUBLE) AS z,
      |  abs(CAST(round(CAST((value - mu) / sd AS DECIMAL(18,8)), 4) AS DOUBLE)) >= 1.5 AS is_outlier
      |FROM w
      |WHERE n_win >= 5 AND sd > 0
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------
  // Last-touch attribution: each purchase credited to the user's most
  // recent non-purchase event within the preceding hour. One window
  // carries the last non-purchase (sec, id, type) struct forward with
  // IGNORE NULLS over (sec, event_id) ROWS ordering — identical frames
  // in both engines — and the hour cut is applied after, so a stale
  // touch yields an explicit unattributed purchase row (touch columns
  // NULL) rather than a dropped one. One user_id exchange; the frame
  // never materializes history, it carries a single struct.
  private def attributionLastTouch(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val inWindow = col("touch").isNotNull && col("touch.t_sec") >= col("sec") - 3600
    Tables.events(spark, dir)
      .withColumn("sec", col("ts").cast("long"))
      .withColumn("touch",
        last(when(col("event_type") =!= "purchase",
          struct(col("sec").as("t_sec"), col("event_id").as("t_id"),
            col("event_type").as("t_type"))), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id"), col("user_id"), col("sec"), col("value"),
        when(inWindow, col("touch.t_id")).as("touch_event_id"),
        when(inWindow, col("touch.t_type")).as("touch_type"),
        when(inWindow, col("sec") - col("touch.t_sec")).as("gap_sec"))
      .orderBy(col("event_id"))
  }

  private val attributionLastTouchSql =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, value,
      |    epoch_ns(ts) // 1000000000 AS sec
      |  FROM events
      |), t AS (
      |  SELECT event_id, user_id, event_type, value, sec,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN sec END IGNORE NULLS) OVER win AS t_sec,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN event_id END IGNORE NULLS) OVER win AS t_id,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS) OVER win AS t_type
      |  FROM e
      |  WINDOW win AS (PARTITION BY user_id ORDER BY sec, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |)
      |SELECT event_id, user_id, sec, value,
      |  CASE WHEN t_sec >= sec - 3600 THEN t_id END AS touch_event_id,
      |  CASE WHEN t_sec >= sec - 3600 THEN t_type END AS touch_type,
      |  CASE WHEN t_sec >= sec - 3600 THEN sec - t_sec END AS gap_sec
      |FROM t WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------
  // Robust dispersion per event class: median + MAD (median absolute
  // deviation), the outlier-resistant twin of avg/stddev — a handful
  // of fat-finger values shift stddev arbitrarily but move MAD by at
  // most one order statistic. Two grouped EXACT percentile passes with
  // the (5-row) median table broadcast between them; exact percentile
  // per group is an O(group) sort at worst, the right trade below the
  // approx_percentile crossover, and the group count here is bounded
  // by the event-type domain.
  private def madRobust(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(col("event_type"), col("value"))
    val med = e.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5D)").as("med"))
    e.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("value") - col("med")))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        rnd(first(col("med")), 6).as("median_value"),
        rnd(expr("percentile(dev, 0.5D)"), 6).as("mad"))
      .orderBy(col("event_type"))
  }

  private val madRobustSql =
    """WITH med AS (
      |  SELECT event_type, quantile_cont(value, 0.5) AS med
      |  FROM events GROUP BY event_type
      |)
      |SELECT e.event_type, count(*) AS n,
      |  CAST(round(CAST(m.med AS DECIMAL(18,8)), 6) AS DOUBLE) AS median_value,
      |  CAST(round(CAST(quantile_cont(abs(e.value - m.med), 0.5) AS DECIMAL(18,8)), 6) AS DOUBLE) AS mad
      |FROM events e JOIN med m USING (event_type)
      |GROUP BY e.event_type, m.med
      |ORDER BY e.event_type""".stripMargin

  // ---------------------------------------------------------------
  // Time-weighted average per user — the telemetry/billing mean where
  // each reading holds until the next one, so sparse bursts don't
  // dominate: weight = seconds until the user's next event (lead
  // window), TWA = Σ(value·dur)/Σ(dur). Users with one event (or only
  // simultaneous events) have no holding intervals and surface with
  // n_intervals = 0 rather than dropping out. One user_id exchange
  // serves both the lead window and the final aggregation.
  private def timeWeightedAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("sec", col("ts").cast("long"))
      .withColumn("dur", lead(col("sec"), 1).over(w) - col("sec"))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("dur") > 0, 1).otherwise(0)).cast("long").as("n_intervals"),
        coalesce(sum(when(col("dur") > 0, col("dur"))), lit(0L)).as("span_sec"),
        rnd(sum(when(col("dur") > 0, col("value") * col("dur"))) /
          sum(when(col("dur") > 0, col("dur"))), 6).as("twa"))
      .orderBy(col("user_id"))
  }

  private val timeWeightedAvgSql =
    """WITH d AS (
      |  SELECT user_id, value,
      |    lead(epoch_ns(ts) // 1000000000) OVER win - epoch_ns(ts) // 1000000000 AS dur
      |  FROM events
      |  WINDOW win AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000000000, event_id)
      |)
      |SELECT user_id,
      |  CAST(sum(CASE WHEN dur > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_intervals,
      |  COALESCE(CAST(sum(CASE WHEN dur > 0 THEN dur END) AS BIGINT), 0) AS span_sec,
      |  CAST(round(CAST(sum(CASE WHEN dur > 0 THEN value * dur END)
      |    / sum(CASE WHEN dur > 0 THEN dur END) AS DECIMAL(18,8)), 6) AS DOUBLE) AS twa
      |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------
  // Sequence mining: the most-traveled 3-step event paths — the
  // navigation-analysis extension of the 2-step transition matrix.
  // Two lag windows on ONE user_id partitioning extract each
  // consecutive triple (ordered by (sec, event_id) so ties are
  // deterministic in both engines), then a tiny |event_types|³-bounded
  // aggregation ranks them; top-10 with a path tiebreak.
  private def topPaths(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("sec", col("ts").cast("long"))
      .withColumn("e1", lag(col("event_type"), 2).over(w))
      .withColumn("e2", lag(col("event_type"), 1).over(w))
      // all three legs non-null: Spark's concat_ws would silently SKIP a
      // null middle/last leg (2-segment path) where the DuckDB twin's ||
      // nulls the whole path — guard both engines identically instead
      .filter(col("e1").isNotNull && col("e2").isNotNull && col("event_type").isNotNull)
      .select(concat_ws(">", col("e1"), col("e2"), col("event_type")).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(10)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("path"))).cast("long"))
      .select(col("rank"), col("path"), col("n"))
      .orderBy(col("rank"))
  }

  private val topPathsSql =
    """WITH s AS (
      |  SELECT user_id,
      |    lag(event_type, 2) OVER win AS e1,
      |    lag(event_type, 1) OVER win AS e2,
      |    event_type AS e3
      |  FROM events
      |  WINDOW win AS (PARTITION BY user_id
      |                 ORDER BY epoch_ns(ts) // 1000000000, event_id)
      |), p AS (
      |  SELECT e1 || '>' || e2 || '>' || e3 AS path, count(*) AS n
      |  FROM s WHERE e1 IS NOT NULL AND e2 IS NOT NULL AND e3 IS NOT NULL
      |  GROUP BY 1
      |)
      |SELECT row_number() OVER (ORDER BY n DESC, path) AS rank, path, n
      |FROM p ORDER BY n DESC, path LIMIT 10""".stripMargin

  // ---------------------------------------------------------------
  // Referential-integrity audit — the data-quality gate a pipeline
  // runs before trusting a snapshot: orphan lineitems (no parent
  // order), childless orders, orders whose o_totalprice disagrees with
  // the computed lineitem total beyond a tolerance, and null-key rows.
  // Shape: the child side aggregates to one row per parent BEFORE the
  // join (map-side combined), then one orderkey full-outer join carries
  // every violation class; the output is a fixed handful of metric
  // rows at any scale. TPC-H's o_totalprice is computed with taxes and
  // discounts, so the naive extendedprice sum differs — the audit
  // reports the violation count under the exact reconstruction
  // formula, making "0 orphans, 0 mismatches" a real invariant.
  private def auditReferential(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.table(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(Registry.rnd(sum(Registry.dec(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))), 2)
        .as("li_total"), count(lit(1)).as("n_lines"))
    val o = Tables.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val joined = o.join(li, col("o_orderkey") === col("l_orderkey"), "full_outer")
    // a NULL-key row on either side never joins (NULL != NULL), so it
    // surfaces with BOTH keys null after the outer join — its own
    // violation class, not an orphan or a childless order
    joined.agg(
        sum(when(col("o_orderkey").isNull && col("l_orderkey").isNotNull, 1).otherwise(0))
          .cast("long").as("orphan_lineitem_orders"),
        sum(when(col("l_orderkey").isNull && col("o_orderkey").isNotNull, 1).otherwise(0))
          .cast("long").as("childless_orders"),
        sum(when(col("o_orderkey").isNull && col("l_orderkey").isNull, 1).otherwise(0))
          .cast("long").as("null_key_rows"),
        sum(when(col("o_orderkey").isNotNull && col("l_orderkey").isNotNull &&
            abs(col("o_totalprice") - col("li_total")) > 0.011, 1).otherwise(0))
          .cast("long").as("price_mismatches"),
        count(lit(1)).as("n_audited"))
  }

  private val auditReferentialSql =
    """WITH li AS (
      |  SELECT l_orderkey,
      |    CAST(round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,4))) AS DECIMAL(18,8)), 2) AS DOUBLE) AS li_total,
      |    count(*) AS n_lines
      |  FROM lineitem GROUP BY l_orderkey
      |), j AS (
      |  SELECT o.o_orderkey, o.o_totalprice, li.l_orderkey, li.li_total
      |  FROM orders o FULL OUTER JOIN li ON o.o_orderkey = li.l_orderkey
      |)
      |SELECT
      |  CAST(sum(CASE WHEN o_orderkey IS NULL AND l_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS orphan_lineitem_orders,
      |  CAST(sum(CASE WHEN l_orderkey IS NULL AND o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS childless_orders,
      |  CAST(sum(CASE WHEN o_orderkey IS NULL AND l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_key_rows,
      |  CAST(sum(CASE WHEN o_orderkey IS NOT NULL AND l_orderkey IS NOT NULL
      |    AND abs(o_totalprice - li_total) > 0.011 THEN 1 ELSE 0 END) AS BIGINT) AS price_mismatches,
      |  count(*) AS n_audited
      |FROM j""".stripMargin

  // ---------------------------------------------------------------
  // One PageRank power-iteration over the weighted event-transition
  // graph (edges = events_transitions, weights = transition counts),
  // from a uniform prior, damping 0.85, dangling mass redistributed
  // uniformly. Graph ops beyond connected components (dedup_cluster_*):
  // the per-iteration dataflow — contributions = ranks ⋈ edges grouped
  // by destination — is one equi-join + one aggregation, which is
  // exactly how the iteration scales to billions of edges (iterating
  // re-runs the same shape with the previous ranks as input, the
  // kmeans/LR/k-center one-step pattern). Node cardinality here is the
  // event-type vocabulary; the plan is identical for arbitrary keys.
  //
  // Determinism: per-edge contribution terms snap to DECIMAL(18,8)
  // before the destination sum (order-independent), and the uniform
  // prior/dangling terms are integer-derived doubles.
  private def pagerankStep(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("sec", expr("ts_ns div 1000000000"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    // NOTE (r18 A/B): pinning edges/nodes (localCheckpoint) was tried
    // and REVERTED — the replayed consumers are pruned to near-nothing
    // under the bench's count() action, so the eager pins slowed the
    // measured query 0.34->0.43 s min.
    val edges = ev
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type").as("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("w"))
    val nodes = ev.select(col("event_type").as("node")).distinct()
    val nV = nodes.agg(count(lit(1)).as("n_nodes"))
    val outW = edges.groupBy(col("src")).agg(sum(col("w")).as("out_w"))
    // dangling nodes: no outgoing edges → their (uniform) rank mass
    // spreads evenly; count is exact, so the term is deterministic
    val dangling = nodes.join(outW.select(col("src").as("node")), Seq("node"), "left_anti")
      .agg(count(lit(1)).as("n_dangling"))
    // contribution of src→dst: r0(src) * w / out_w = (1/|V|) * w/out_w
    val contribs = edges.join(outW, "src")
      .crossJoin(broadcast(nV))
      .withColumn("term",
        ((lit(1.0) / col("n_nodes")) * col("w") / col("out_w")).cast("decimal(18,8)"))
      .groupBy(col("dst").as("node"))
      .agg(sum(col("term")).cast("double").as("in_mass"))
    nodes
      .join(contribs, Seq("node"), "left")
      .crossJoin(broadcast(nV))
      .crossJoin(broadcast(dangling))
      .withColumn("rank", rnd(
        lit(0.15) / col("n_nodes") +
          lit(0.85) * (coalesce(col("in_mass"), lit(0.0)) +
            col("n_dangling") / col("n_nodes").cast("double") / col("n_nodes")), 6))
      .select(col("node"), col("rank"))
      .orderBy(col("node"))
  }

  private val pagerankStepSql =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type, epoch_ns(ts)//1000000000 AS sec FROM events
      |), edges AS (
      |  SELECT src, dst, count(*) AS w FROM (
      |    SELECT event_type AS dst,
      |      lag(event_type) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS src
      |    FROM ev) t
      |  WHERE src IS NOT NULL GROUP BY src, dst
      |), nodes AS (
      |  SELECT DISTINCT event_type AS node FROM ev
      |), nv AS (SELECT count(*) AS n_nodes FROM nodes
      |), outw AS (SELECT src, sum(w) AS out_w FROM edges GROUP BY src
      |), dang AS (
      |  SELECT count(*) AS n_dangling FROM nodes
      |  WHERE node NOT IN (SELECT src FROM outw)
      |), contribs AS (
      |  SELECT e.dst AS node,
      |    CAST(sum(CAST((1.0 / nv.n_nodes) * e.w / o.out_w AS DECIMAL(18,8))) AS DOUBLE) AS in_mass
      |  FROM edges e JOIN outw o ON e.src = o.src, nv
      |  GROUP BY e.dst
      |)
      |SELECT n.node,
      |  CAST(round(CAST(0.15 / nv.n_nodes
      |    + 0.85 * (COALESCE(c.in_mass, 0.0)
      |      + CAST(dang.n_dangling AS DOUBLE) / nv.n_nodes / nv.n_nodes)
      |    AS DECIMAL(18,8)), 6) AS DOUBLE) AS rank
      |FROM nodes n LEFT JOIN contribs c ON n.node = c.node, nv, dang
      |ORDER BY n.node""".stripMargin

  // ---------------------------------------------------------------
  // Exponential recency decay (1-day half-life, day-granular age,
  // floor 1/64): the recency weighting a training-data sampler applies
  // so fresh data counts more — each event weighs 2^-min(age_days, 6)
  // against the corpus's newest event. Shape: a 1-row max-ts aggregate broadcasts back over the
  // scan (the domain-mix/q11 global-stat pattern), the weight is a
  // pure projection, and the per-type rollup partial-aggregates; the
  // decayed average divides two exact DECIMAL sums. Per-row terms snap
  // to DECIMAL(18,8) so both engines sum identical values in any order.
  private def decayHalflife(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("sec", expr("ts_ns div 1000000000"))
    val tmax = ev.agg(max(col("sec")).as("tmax"))
    // Cross-engine determinism: any double→decimal snap of 2^-age lets
    // the engines' casts disagree at representation boundaries (Spark
    // casts via the shortest decimal repr, DuckDB via the binary value
    // — observed at sf0.01 AND sf0.1, amplified because weight values
    // repeat across many rows). So the weight is built with NO double
    // arithmetic at all: day-granular age, exponent capped at 6, and
    // the seven possible 2^-k weights written as exact decimal
    // literals; the term product and sums are then exact decimal
    // arithmetic, identical in both engines by construction. (Day
    // granularity + a 1/64 floor is also the practical variant — a
    // sampler doesn't distinguish freshness within a day, and weights
    // below 2% contribute noise, not signal.)
    ev.crossJoin(broadcast(tmax))
      .withColumn("day_age", expr("least((tmax - sec) div 86400, 6L)"))
      .withColumn("w8", expr(
        """cast(case day_age when 0 then '1' when 1 then '0.5' when 2 then '0.25'
          |  when 3 then '0.125' when 4 then '0.0625' when 5 then '0.03125'
          |  else '0.015625' end as decimal(9,6))""".stripMargin))
      .withColumn("dv", dec(col("value")) * col("w8"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("w8")), 4).cast("double").as("decayed_weight"),
        round(sum(col("dv")), 4).cast("double").as("decayed_sum"))
      .select(col("event_type"), col("n"),
        col("decayed_weight"), col("decayed_sum"),
        rnd(col("decayed_sum") / col("decayed_weight"), 6).as("decayed_avg"))
      .orderBy(col("event_type"))
  }

  private val decayHalflifeSql =
    """WITH ev AS (
      |  SELECT event_type, value, epoch_ns(ts)//1000000000 AS sec FROM events
      |), m AS (SELECT max(sec) AS tmax FROM ev
      |), t AS (
      |  SELECT event_type,
      |    CAST(CASE least((tmax - sec) // 86400, 6)
      |      WHEN 0 THEN '1' WHEN 1 THEN '0.5' WHEN 2 THEN '0.25'
      |      WHEN 3 THEN '0.125' WHEN 4 THEN '0.0625' WHEN 5 THEN '0.03125'
      |      ELSE '0.015625' END AS DECIMAL(9,6)) AS w8,
      |    CAST(value AS DECIMAL(18,4)) * CAST(CASE least((tmax - sec) // 86400, 6)
      |      WHEN 0 THEN '1' WHEN 1 THEN '0.5' WHEN 2 THEN '0.25'
      |      WHEN 3 THEN '0.125' WHEN 4 THEN '0.0625' WHEN 5 THEN '0.03125'
      |      ELSE '0.015625' END AS DECIMAL(9,6)) AS dv
      |  FROM ev, m
      |), agg AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(round(sum(w8), 4) AS DOUBLE) AS decayed_weight,
      |    CAST(round(sum(dv), 4) AS DOUBLE) AS decayed_sum
      |  FROM t GROUP BY event_type
      |)
      |SELECT event_type, n, decayed_weight, decayed_sum,
      |  CAST(round(CAST(decayed_sum / decayed_weight AS DECIMAL(18,8)), 6) AS DOUBLE) AS decayed_avg
      |FROM agg ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------
  // Fuzzy entity resolution over part names — the record-linkage idiom
  // on the native [[graft.expressions.JaroWinkler]] Catalyst expression
  // (Spark ships levenshtein/soundex but no Jaro-Winkler; a Scala UDF
  // here would box every pair and break whole-stage codegen — the
  // expression inlines as one static call). Scale shape: the corpus
  // first reduces to its NAME VOCABULARY with frequencies (one
  // map-side-combinable pass — 100 TB of rows, |V| distinct names), and
  // the quadratic runs only over the bounded vocabulary via a broadcast
  // self-join (|V|² pairs, SF-independent here: the name generator is a
  // fixed 8×8 grid). An unbounded vocabulary gets the dedup family's
  // remediation: block on a cheap key (first token / soundex) and cap
  // block occupancy — the dedup_jaccard_capped discipline.
  //
  // Determinism: jw is a rational of small integers computed identically
  // in both engines (textbook Winkler, 0.7 boost threshold — pinned
  // against DuckDB 1.0 in JaroWinklerSpec), snapped at 6 dp before the
  // filter so the cut cannot drift cross-engine.
  private def fuzzyMatch(spark: SparkSession, dir: String): DataFrame = {
    val vocab = table(spark, dir, "part")
      .groupBy(col("p_name")).agg(count(lit(1)).as("n"))
    val a = vocab.select(col("p_name").as("name_a"), col("n").as("n_a"))
    val b = vocab.select(col("p_name").as("name_b"), col("n").as("n_b"))
    a.join(broadcast(b), col("name_a") < col("name_b"))
      .withColumn("jw",
        rnd(graft.expressions.StringSimFunctions.jaroWinkler(col("name_a"), col("name_b")), 6))
      .filter(col("jw") >= 0.84)
      .select(col("name_a"), col("name_b"), col("jw"), col("n_a"), col("n_b"))
      .orderBy(col("jw").desc, col("name_a"), col("name_b"))
  }

  private val fuzzyMatchSql =
    """WITH vocab AS (
      |  SELECT p_name, count(*) AS n FROM part GROUP BY 1
      |), pairs AS (
      |  SELECT a.p_name AS name_a, b.p_name AS name_b,
      |    CAST(round(CAST(jaro_winkler_similarity(a.p_name, b.p_name)
      |      AS DECIMAL(18,8)), 6) AS DOUBLE) AS jw,
      |    a.n AS n_a, b.n AS n_b
      |  FROM vocab a JOIN vocab b ON a.p_name < b.p_name
      |)
      |SELECT name_a, name_b, jw, n_a, n_b
      |FROM pairs WHERE jw >= 0.84
      |ORDER BY jw DESC, name_a, name_b""".stripMargin

  // ---------------------------------------------------------------
  // URL scalar family — parse_url over crawl-style URLs synthesized
  // from the documents table (the web-crawl curation stack's most-used
  // scalar: host for per-domain caps, path depth for boilerplate
  // heuristics, query params for tracker stripping). Spark's
  // `parse_url` is java.net.URI-backed; DuckDB has no URL parser, so
  // the oracle twin extracts the same components with anchored
  // regexes — equivalent on well-formed URLs (these are; a crawl
  // pipeline puts a validity filter in front, the P6 discipline).
  // Pure projection: zero shuffle except the per-host rollup, which
  // partial-aggregates map-side.
  private def scalarUrl(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .withColumn("url", concat(lit("https://"), col("source"),
        lit(".example.com/docs/"), col("lang"), lit("/"), col("doc_id"),
        lit("?lang="), col("lang"), lit("&ref=crawl")))
      .select(
        expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'PATH')").as("path"),
        expr("parse_url(url, 'QUERY')").as("query"),
        expr("parse_url(url, 'QUERY', 'lang')").as("q_lang"),
        (size(split(expr("parse_url(url, 'PATH')"), "/")) - 1).as("path_depth"))
      .groupBy(col("host"), col("q_lang"), col("path_depth"))
      .agg(count(lit(1)).as("n_urls"),
        min(col("path")).as("first_path"),
        max(col("query")).as("last_query"))
      .orderBy(col("host"), col("q_lang"), col("path_depth"))

  private val scalarUrlSql =
    """WITH u AS (
      |  SELECT 'https://' || source || '.example.com/docs/' || lang || '/' || doc_id
      |      || '?lang=' || lang || '&ref=crawl' AS url
      |  FROM documents
      |), parts AS (
      |  SELECT
      |    regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
      |    regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
      |    regexp_extract(url, '\?([^#]*)', 1) AS query,
      |    regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS q_lang
      |  FROM u
      |)
      |SELECT host, q_lang,
      |  len(string_split(path, '/')) - 1 AS path_depth,
      |  count(*) AS n_urls,
      |  min(path) AS first_path,
      |  max(query) AS last_query
      |FROM parts
      |GROUP BY 1, 2, 3
      |ORDER BY host, q_lang, path_depth""".stripMargin

  // ---------------------------------------------------------------
  // Entity resolution, completed: fuzzy pairs unioned into name
  // CLUSTERS (connected components over the JW graph) with the
  // survivorship rule every MDM pipeline needs — the
  // cluster's canonical form is its most frequent spelling (ties to
  // the alphabetically first), and every member maps to it. Cluster
  // identity = the lexicographically smallest member, so the output
  // is stable under any traversal order.
  //
  // Scale shape: the graph lives on the BOUNDED NAME VOCABULARY (the
  // fuzzy-match reduction), so components resolve with driver-side
  // union-find over the |V|-row frame — the bounded-collect codebook
  // pattern (K-row frames may cross the driver; corpora may not). An
  // unbounded vocabulary swaps in the distributed star-contraction CC
  // (dedup_cluster_star) over the same pair table — the shape is
  // already in the engine. The oracle twin computes the same
  // components as a recursive-CTE reachability closure.
  //
  // The clustering threshold is 0.90, HIGHER than the pair query's
  // 0.84 — the classic ER lesson, measured on this fixture: at 0.84
  // transitive chaining merges 56 of the 64 names into one blob
  // ("cold anvil" ~ "old anvil" ~ ... hops across adjectives), while
  // 0.90 yields the true near-dup families (the cold/old pairs plus
  // the bolt/plate confusables). Pairwise evidence tolerates a loose
  // threshold; CLUSTERING must price in the closure.
  private def fuzzyClusters(spark: SparkSession, dir: String): DataFrame = {
    val vocab = table(spark, dir, "part")
      .groupBy(col("p_name")).agg(count(lit(1)).as("n"))
    val pairs = {
      val a = vocab.select(col("p_name").as("name_a"), col("n").as("n_a"))
      val b = vocab.select(col("p_name").as("name_b"), col("n").as("n_b"))
      a.join(broadcast(b), col("name_a") < col("name_b"))
        .withColumn("jw",
          rnd(graft.expressions.StringSimFunctions.jaroWinkler(col("name_a"), col("name_b")), 6))
        .filter(col("jw") >= 0.90)
        .select(col("name_a"), col("name_b"))
    }
    // bounded-vocabulary union-find on the driver (|V| = 64 here; the
    // collect is capped by the vocabulary, never the corpus)
    val names = vocab.select(col("p_name")).collect().map(_.getString(0))
    val parent = scala.collection.mutable.Map(names.map(n => n -> n): _*)
    def find(x: String): String = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    pairs.collect().foreach { row =>
      val (ra, rb) = (find(row.getString(0)), find(row.getString(1)))
      if (ra != rb) { // union by lexicographic min keeps roots canonical
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    val mapping = names.map(n => (n, find(n))).toSeq
    import spark.implicits._
    val labeled = mapping.toDF("p_name", "cluster")
    val w = Window.partitionBy(col("cluster")).orderBy(col("n").desc, col("p_name"))
    vocab.join(broadcast(labeled), "p_name")
      .withColumn("rk", row_number().over(w))
      .groupBy(col("cluster"))
      .agg(
        count(lit(1)).as("n_names"),
        sum(col("n")).as("total_docs"),
        max(when(col("rk") === 1, col("p_name"))).as("canonical"),
        array_join(sort_array(collect_list(col("p_name"))), ",").as("members"))
      .filter(col("n_names") >= 2) // singletons are their own trivial cluster
      .select(col("cluster"), col("canonical"), col("n_names"),
        col("total_docs"), col("members"))
      .orderBy(col("cluster"))
  }

  private val fuzzyClustersSql =
    """WITH RECURSIVE vocab AS (
      |  SELECT p_name, count(*) AS n FROM part GROUP BY 1
      |), pairs AS (
      |  SELECT a.p_name AS name_a, b.p_name AS name_b
      |  FROM vocab a JOIN vocab b ON a.p_name < b.p_name
      |  WHERE CAST(round(CAST(jaro_winkler_similarity(a.p_name, b.p_name)
      |    AS DECIMAL(18,8)), 6) AS DOUBLE) >= 0.90
      |), edges AS (
      |  SELECT name_a AS s, name_b AS d FROM pairs
      |  UNION ALL SELECT name_b, name_a FROM pairs
      |), reach AS (
      |  SELECT p_name AS name, p_name AS label FROM vocab
      |  UNION
      |  SELECT e.d AS name, r.label
      |  FROM reach r JOIN edges e ON e.s = r.name
      |), comp AS (
      |  SELECT name AS p_name, min(label) AS cluster FROM reach GROUP BY name
      |), stats AS (
      |  SELECT c.cluster, v.p_name, v.n,
      |    row_number() OVER (PARTITION BY c.cluster ORDER BY v.n DESC, v.p_name) AS rk
      |  FROM comp c JOIN vocab v USING (p_name)
      |)
      |SELECT cluster,
      |  max(CASE WHEN rk = 1 THEN p_name END) AS canonical,
      |  count(*) AS n_names,
      |  CAST(sum(n) AS BIGINT) AS total_docs,
      |  string_agg(p_name, ',' ORDER BY p_name) AS members
      |FROM stats
      |GROUP BY cluster
      |HAVING count(*) >= 2
      |ORDER BY cluster""".stripMargin

  // ---------------------------------------------------------------
  // ER threshold-sensitivity sweep — the dedup_fuzzy_clusters chaining
  // lesson made MACHINE-VISIBLE (r15 verdict #7): for each JW cut in a
  // fixed grid, the sweep reports the closure's shape over the bounded
  // name-vocabulary graph — edge count, non-singleton component count,
  // MAX component size (the blob detector: on this fixture 0.84 chains
  // 56/64 names into one component while 0.90 yields the 10 true
  // families), clustered-name mass, and a precision proxy (fraction of
  // accepted pairs sharing their final token — the generator's noun, a
  // cheap truth label for adjective-typo near-dups). A threshold
  // regression now moves a hash-gated row instead of a scaladoc.
  //
  // Scale shape: identical to fuzzyClusters — ONE corpus reduction to
  // the |V|-name vocabulary, one broadcast |V|² scoring pass collected
  // once (the bounded-collect codebook pattern), then the 8-threshold
  // union-find sweep is driver arithmetic on that K-row frame. The
  // oracle twin runs the same grid as a recursive-CTE closure keyed by
  // (threshold, name).
  //
  // Determinism: jw snaps at 6 dp before every cut; grid thresholds
  // are the same decimal literals cast to double in both engines; the
  // precision proxy divides exact integers and snaps at 4 dp (NULL on
  // zero-edge thresholds — the degenerate-source convention).
  private val erSweepGrid =
    Vector("0.80", "0.82", "0.84", "0.86", "0.88", "0.90", "0.92", "0.94")

  private def erThresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    val vocab = table(spark, dir, "part")
      .groupBy(col("p_name")).agg(count(lit(1)).as("n"))
    val a = vocab.select(col("p_name").as("name_a"))
    val b = vocab.select(col("p_name").as("name_b"))
    val pairs = a.join(broadcast(b), col("name_a") < col("name_b"))
      .withColumn("jw", rnd(
        graft.expressions.StringSimFunctions.jaroWinkler(col("name_a"), col("name_b")), 6))
      .filter(col("jw") >= erSweepGrid.head.toDouble)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val names = vocab.select(col("p_name")).collect().map(_.getString(0))
    def snap4(x: Double): Double =
      BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = erSweepGrid.map { ts =>
      val t = ts.toDouble
      val edges = pairs.filter(_._3 >= t)
      val parent = scala.collection.mutable.Map(names.map(x => x -> x): _*)
      def find(x: String): String = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      edges.foreach { case (x, y, _) =>
        val (rx, ry) = (find(x), find(y))
        if (rx != ry) { if (rx < ry) parent(ry) = rx else parent(rx) = ry }
      }
      val sizes = names.groupBy(find).map(_._2.length).toVector
      val nEdges = edges.length.toLong
      val sameNoun = edges.count { case (x, y, _) =>
        x.split(" ").last == y.split(" ").last }
      (t, nEdges,
        sizes.count(_ >= 2).toLong,
        sizes.max.toLong,
        sizes.filter(_ >= 2).sum.toLong,
        if (nEdges > 0) Some(snap4(sameNoun.toDouble / nEdges)) else None)
    }
    import spark.implicits._
    rows.toDF("threshold", "n_edges", "n_clusters", "max_cluster_size",
      "n_names_clustered", "precision_proxy")
      .orderBy(col("threshold"))
  }

  private val erThresholdSweepSql = {
    val grid = erSweepGrid.mkString(", ")
    s"""WITH RECURSIVE vocab AS (
      |  SELECT p_name, count(*) AS n FROM part GROUP BY 1
      |), grid AS (
      |  SELECT CAST(unnest([$grid]) AS DOUBLE) AS t
      |), pairsx AS (
      |  SELECT a.p_name AS name_a, b.p_name AS name_b,
      |    CAST(round(CAST(jaro_winkler_similarity(a.p_name, b.p_name)
      |      AS DECIMAL(18,8)), 6) AS DOUBLE) AS jw
      |  FROM vocab a JOIN vocab b ON a.p_name < b.p_name
      |), edges AS (
      |  SELECT g.t, p.name_a AS s, p.name_b AS d FROM pairsx p, grid g WHERE p.jw >= g.t
      |  UNION ALL
      |  SELECT g.t, p.name_b, p.name_a FROM pairsx p, grid g WHERE p.jw >= g.t
      |), reach AS (
      |  SELECT g.t, v.p_name AS name, v.p_name AS label FROM vocab v, grid g
      |  UNION
      |  SELECT e.t, e.d AS name, r.label
      |  FROM reach r JOIN edges e ON e.t = r.t AND e.s = r.name
      |), comp AS (
      |  SELECT t, name, min(label) AS cluster FROM reach GROUP BY 1, 2
      |), sizes AS (
      |  SELECT t, cluster, count(*) AS sz FROM comp GROUP BY 1, 2
      |), cstats AS (
      |  SELECT t,
      |    CAST(sum(CASE WHEN sz >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_clusters,
      |    CAST(max(sz) AS BIGINT) AS max_cluster_size,
      |    CAST(sum(CASE WHEN sz >= 2 THEN sz ELSE 0 END) AS BIGINT) AS n_names_clustered
      |  FROM sizes GROUP BY 1
      |), estats AS (
      |  SELECT g.t, CAST(count(p.name_a) AS BIGINT) AS n_edges,
      |    CAST(sum(CASE WHEN string_split(p.name_a, ' ')[-1] = string_split(p.name_b, ' ')[-1]
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_same_noun
      |  FROM grid g LEFT JOIN pairsx p ON p.jw >= g.t
      |  GROUP BY 1
      |)
      |SELECT c.t AS threshold, e.n_edges, c.n_clusters, c.max_cluster_size,
      |  c.n_names_clustered,
      |  CASE WHEN e.n_edges > 0 THEN
      |    CAST(round(CAST(CAST(e.n_same_noun AS DOUBLE) / e.n_edges
      |      AS DECIMAL(18,8)), 4) AS DOUBLE) END AS precision_proxy
      |FROM cstats c JOIN estats e USING (t)
      |ORDER BY threshold""".stripMargin
  }

  // ---------------------------------------------------------------
  // Weighted median — the aggregate Spark doesn't ship (percentile
  // takes no weight): per brand, the retail price at which half the
  // SIZE-weighted mass sits below (the inventory-weighted price
  // centre; an unweighted median treats a size-1 and a size-50 part
  // the same). Expressed as the classic cumulative-weight rewrite:
  // order values within the group, running-sum the integer weights,
  // take the first value whose doubled cumulative weight reaches the
  // total — lower weighted median, exact by construction (integer
  // weight comparisons; no interpolation, so nothing to snap).
  //
  // Scale shape: one partition-bounded window sort per group + one
  // group-limit pick — the same WindowGroupLimit shape as any per-group
  // argmin; no self-join, no global sort. The unweighted median rides
  // along for contrast.
  private def weightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val parts = table(spark, dir, "part")
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        col("p_size").cast("long").as("w"))
    val wOrd = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice"), col("p_partkey"))
    val cum = parts
      .withColumn("cumw", sum(col("w")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("totw", sum(col("w")).over(Window.partitionBy(col("p_brand"))))
    val wPick = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice"), col("p_partkey"))
    val picked = cum.filter(col("cumw") * 2 >= col("totw"))
      .withColumn("rk", row_number().over(wPick))
      .filter(col("rk") === 1)
      .select(col("p_brand"), col("p_retailprice").as("w_median_price"),
        col("totw").as("total_weight"))
    val plain = parts.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"),
        rnd(expr("percentile(p_retailprice, 0.5)"), 2).as("median_price"))
    plain.join(picked, "p_brand")
      .select(col("p_brand"), col("n_parts"), col("total_weight"),
        col("median_price"), col("w_median_price"))
      .orderBy(col("p_brand"))
  }

  private val weightedMedianSql =
    """WITH parts AS (
      |  SELECT p_brand, p_partkey, p_retailprice, CAST(p_size AS BIGINT) AS w
      |  FROM part
      |), cum AS (
      |  SELECT p_brand, p_retailprice,
      |    sum(w) OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
      |    sum(w) OVER (PARTITION BY p_brand) AS totw,
      |    row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey) AS ord
      |  FROM parts
      |), picked AS (
      |  SELECT p_brand, p_retailprice AS w_median_price, totw AS total_weight
      |  FROM (
      |    SELECT *, row_number() OVER (PARTITION BY p_brand ORDER BY ord) AS rk
      |    FROM cum WHERE cumw * 2 >= totw
      |  ) WHERE rk = 1
      |), plain AS (
      |  SELECT p_brand, count(*) AS n_parts,
      |    CAST(round(CAST(quantile_cont(p_retailprice, 0.5) AS DECIMAL(18,8)), 2) AS DOUBLE) AS median_price
      |  FROM parts GROUP BY 1
      |)
      |SELECT pl.p_brand, pl.n_parts, CAST(pk.total_weight AS BIGINT) AS total_weight,
      |  pl.median_price, pk.w_median_price
      |FROM plain pl JOIN picked pk USING (p_brand)
      |ORDER BY p_brand""".stripMargin
}
