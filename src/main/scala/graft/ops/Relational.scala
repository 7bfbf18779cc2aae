package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Registry.{dec, sumDec2, avgDec2, rnd}
import Tables.table

/** The general operator inventory (SURVEY.md §2.6): joins, aggregations,
  * windows, set ops, sort/limit/top-k, scalar functions — each as a
  * declarative DataFrame plan (Catalyst handles pushdown/pruning/join
  * strategy) with a DuckDB oracle twin.
  *
  * Scale notes are per query; the common rules: every join keys on the
  * natural key so the shuffle is the minimum one; dimension tables
  * (region/nation/part/supplier at TPC-H ratios) are broadcast; floats
  * aggregate through DECIMAL for cross-engine determinism.
  */
object Relational {

  def queries: Vector[NamedQuery] = Vector(
    // ---- aggregations ----
    NamedQuery("q1_pricing_summary", q1, Some(q1Sql)),
    NamedQuery("agg_distinct_orders", aggDistinct, Some(aggDistinctSql)),
    NamedQuery("agg_rollup_lineitem", aggRollup, Some(aggRollupSql)),
    NamedQuery("agg_cube_orders", aggCube, Some(aggCubeSql)),
    // ---- joins ----
    NamedQuery("q3_shipping_priority", q3, Some(q3Sql)),
    NamedQuery("q5_regional_revenue", q5, Some(q5Sql)),
    NamedQuery("join_left_order_counts", joinLeft, Some(joinLeftSql)),
    NamedQuery("join_semi_open_orders", joinSemi, Some(joinSemiSql)),
    NamedQuery("join_anti_no_orders", joinAnti, Some(joinAntiSql)),
    NamedQuery("join_broadcast_part_revenue", joinBroadcast, Some(joinBroadcastSql)),
    NamedQuery("asof_join_latest_order", asofJoin, Some(asofJoinSql)),
    // ---- windows ----
    NamedQuery("win_top_orders_per_cust", winTopPerCust, Some(winTopPerCustSql)),
    NamedQuery("win_running_revenue", winRunning, Some(winRunningSql)),
    NamedQuery("win_lag_delta", winLag, Some(winLagSql)),
    NamedQuery("win_ntile_quartiles", winNtile, Some(winNtileSql)),
    NamedQuery("win_first_last_range", winFirstLast, Some(winFirstLastSql)),
    // ---- sort / limit / set ops ----
    NamedQuery("sort_topk_lineitems", sortTopK, Some(sortTopKSql)),
    NamedQuery("setop_union", setUnion, Some(setUnionSql)),
    NamedQuery("setop_intersect", setIntersect, Some(setIntersectSql)),
    NamedQuery("setop_except", setExcept, Some(setExceptSql)),
    // ---- scalar functions / expressions ----
    NamedQuery("scalar_string_funcs", scalarString, Some(scalarStringSql)),
    NamedQuery("scalar_date_funcs", scalarDate, Some(scalarDateSql)),
    NamedQuery("scalar_math_funcs", scalarMath, Some(scalarMathSql)),
    NamedQuery("case_when_buckets", caseWhen, Some(caseWhenSql)),
    NamedQuery("explode_part_words", explodeWords, Some(explodeWordsSql)),
    NamedQuery("scalar_array_funcs", arrayFuncs, Some(arrayFuncsSql)),
    NamedQuery("scalar_json_funcs", jsonFuncs, Some(jsonFuncsSql)),
    NamedQuery("agg_approx_sketches", approxSketches, Some(approxSketchesSql)),
    NamedQuery("sql_tpch_q6", sqlQ6, Some(sqlQ6Sql)),
    NamedQuery("agg_grouping_sets", groupingSets, Some(groupingSetsSql)),
  )

  // ---------------------------------------------------------------
  // q1: TPC-H Q1-style pricing summary — hash aggregate with partial
  // (map-side) combine; filter pushed to the parquet scan.
  private def q1(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumDec2(col("l_quantity")).as("sum_qty"),
        sumDec2(col("l_extendedprice")).as("sum_base_price"),
        round(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec(col("l_discount")))), 2)
          .cast("double").as("sum_disc_price"),
        avgDec2(col("l_quantity")).as("avg_qty"),
        avgDec2(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_disc_price,
      |  CAST(round(avg(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS avg_qty,
      |  CAST(round(avg(CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------
  // q3: 3-way join + agg + top-k. customer is the small side of the
  // first join (1:10 vs orders) — Catalyst/AQE picks broadcast; the
  // orders⋈lineitem join shuffles on the shared orderkey.
  private def q3(spark: SparkSession, dir: String): DataFrame = {
    val c = table(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = table(spark, dir, "orders")
    val l = table(spark, dir, "lineitem")
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec(col("l_discount")))), 2)
        .cast("double").as("revenue"))
      .select(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  private val q3Sql =
    """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_orderpriority,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------
  // q5: 6-table star join. region/nation/supplier are broadcast-size at
  // every SF (25/5 rows, 1:600 supplier ratio); the big fact joins key
  // on orderkey. Explicit broadcast() on the dims documents the intent
  // even though AQE would choose it.
  private def q5(spark: SparkSession, dir: String): DataFrame = {
    val region = broadcast(table(spark, dir, "region").filter(col("r_name") === "ASIA"))
    val nation = broadcast(table(spark, dir, "nation"))
    val supplier = broadcast(table(spark, dir, "supplier"))
    val customer = table(spark, dir, "customer")
    val orders = table(spark, dir, "orders")
    val lineitem = table(spark, dir, "lineitem")
    customer
      .join(orders, col("c_custkey") === col("o_custkey"))
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(nation, col("s_nationkey") === col("n_nationkey"))
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec(col("l_discount")))), 2)
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q5Sql =
    """SELECT n_name,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------
  private def joinLeft(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
      .join(table(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        sumDec2(coalesce(col("o_totalprice"), lit(0.0))).as("total_spent"))
      .orderBy(col("c_custkey"))

  private val joinLeftSql =
    """SELECT c_custkey, count(o_orderkey) AS n_orders,
      |  CAST(round(sum(CAST(coalesce(o_totalprice, 0.0) AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_spent
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey
      |ORDER BY c_custkey""".stripMargin

  private def joinSemi(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
      .join(table(spark, dir, "orders").filter(col("o_orderstatus") === "O"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  private val joinSemiSql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin

  private def joinAnti(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
      .join(table(spark, dir, "orders").filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  private val joinAntiSql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin

  // part is 1:30 vs lineitem — explicit broadcast keeps the fact table
  // un-shuffled (map-side join at any SF since part grows with SF but
  // stays dimension-sized; at true 100 TB switch to shuffle join via AQE).
  private def joinBroadcast(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .join(broadcast(table(spark, dir, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec(col("l_discount")))), 2)
          .cast("double").as("revenue"))
      .orderBy(col("p_brand"))

  private val joinBroadcastSql =
    """SELECT p_brand, count(*) AS n_items,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------
  // as-of join: for each event, the user's most recent order as of the
  // event time — implemented with the union + running-`last` trick: tag
  // both sides, sort per user by time (orders before events at equal t),
  // and carry the latest order forward. One shuffle on the user key,
  // linear scan per partition — no range-join pair blowup, which is what
  // makes this the 100 TB formulation (a naive events x orders range
  // join materializes |events| * avg-orders-per-user pairs first).
  private def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id").as("u"), expr("ts_ns div 1000000000").as("t"),
        lit(0).as("is_order"), lit(null).cast("long").as("o_orderkey"))
    val o = table(spark, dir, "orders")
      .select(lit(null).cast("long").as("event_id"), col("o_custkey").as("u"),
        unix_timestamp(col("o_orderdate")).as("t"), lit(1).as("is_order"), col("o_orderkey"))
    val w = Window.partitionBy(col("u"))
      .orderBy(col("t"), col("is_order").desc, col("o_orderkey").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.unionByName(e)
      .withColumn("asof_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .withColumn("asof_order_sec", last(when(col("is_order") === 1, col("t")), ignoreNulls = true).over(w))
      .filter(col("is_order") === 0 && col("asof_orderkey").isNotNull)
      .select(col("event_id"), col("u").as("user_id"), col("asof_orderkey"), col("asof_order_sec"))
      .orderBy(col("event_id"))
  }

  private val asofJoinSql =
    """SELECT event_id, user_id, asof_orderkey, asof_order_sec FROM (
      |  SELECT e.event_id, e.user_id, o.o_orderkey AS asof_orderkey,
      |    epoch_ms(o.o_orderdate)//1000 AS asof_order_sec,
      |    row_number() OVER (PARTITION BY e.event_id
      |      ORDER BY epoch_ms(o.o_orderdate)//1000 DESC, o.o_orderkey DESC) AS rn
      |  FROM events e JOIN orders o
      |    ON e.user_id = o.o_custkey
      |   AND epoch_ms(o.o_orderdate)//1000 <= epoch_ns(e.ts)//1000000000
      |) WHERE rn = 1
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------
  private def aggDistinct(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        sumDec2(col("o_totalprice")).as("total_price"))
      .orderBy(col("o_orderstatus"))

  private val aggDistinctSql =
    """SELECT o_orderstatus, count(*) AS n_orders,
      |  count(DISTINCT o_custkey) AS n_customers,
      |  count(DISTINCT o_orderpriority) AS n_priorities,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_price
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  private def aggRollup(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sumDec2(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val aggRollupSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  private def aggCube(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), avgDec2(col("o_totalprice")).as("avg_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  private val aggCubeSql =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  CAST(round(avg(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS avg_price
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------
  private def winTopPerCust(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    table(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        dec(col("o_totalprice")).cast("double").as("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  private val winTopPerCustSql =
    """SELECT o_custkey, rn, o_orderkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS o_totalprice
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders
      |) WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  private def winRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    table(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum(dec(col("o_totalprice"))).over(w), 2).cast("double").as("running_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val winRunningSql =
    """SELECT o_custkey, o_orderkey,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_total
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  private def winLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    table(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        round(dec(col("o_totalprice")) - coalesce(lag(dec(col("o_totalprice")), 1).over(w), lit(0).cast("decimal(18,4)")), 2)
          .cast("double").as("delta_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val winLagSql =
    """SELECT o_custkey, o_orderkey,
      |  CAST(round(CAST(o_totalprice AS DECIMAL(18,4)) - coalesce(
      |    lag(CAST(o_totalprice AS DECIMAL(18,4)), 1) OVER (
      |      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |    CAST(0 AS DECIMAL(18,4))), 2) AS DOUBLE) AS delta_price
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  private def winNtile(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_totalprice"), col("o_orderkey"))
    table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        ntile(4).over(w).as("price_quartile"),
        percent_rank().over(w).cast("decimal(18,8)").cast("double").as("pr"))
      .withColumn("pr", round(col("pr").cast("decimal(18,8)"), 6).cast("double"))
      .orderBy(col("o_orderkey"))
  }

  private val winNtileSql =
    """SELECT o_orderkey, o_orderstatus,
      |  ntile(4) OVER w AS price_quartile,
      |  CAST(round(CAST(percent_rank() OVER w AS DECIMAL(18,8)), 6) AS DOUBLE) AS pr
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  private def winFirstLast(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    table(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_order"),
        last(col("o_orderkey")).over(w).as("last_order"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val winFirstLastSql =
    """SELECT o_custkey, o_orderkey,
      |  first_value(o_orderkey) OVER w AS first_order,
      |  last_value(o_orderkey) OVER w AS last_order
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---------------------------------------------------------------
  // top-k: Spark plans TakeOrderedAndProject — no full sort at scale.
  private def sortTopK(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        dec(col("l_extendedprice")).cast("double").as("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(20)

  private val sortTopKSql =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(CAST(l_extendedprice AS DECIMAL(18,4)) AS DOUBLE) AS l_extendedprice
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      |LIMIT 20""".stripMargin

  private def setUnion(spark: SparkSession, dir: String): DataFrame = {
    val c = table(spark, dir, "customer")
    c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
      .union(c.filter(col("c_acctbal") > 5000).select(col("c_custkey")))
      .distinct()
      .orderBy(col("c_custkey"))
  }

  private val setUnionSql =
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      |UNION
      |SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      |ORDER BY c_custkey""".stripMargin

  private def setIntersect(spark: SparkSession, dir: String): DataFrame = {
    val c = table(spark, dir, "customer")
    c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
      .intersect(c.filter(col("c_acctbal") > 5000).select(col("c_custkey")))
      .orderBy(col("c_custkey"))
  }

  private val setIntersectSql =
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      |INTERSECT
      |SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      |ORDER BY c_custkey""".stripMargin

  private def setExcept(spark: SparkSession, dir: String): DataFrame = {
    val c = table(spark, dir, "customer")
    c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
      .except(c.filter(col("c_acctbal") > 5000).select(col("c_custkey")))
      .orderBy(col("c_custkey"))
  }

  private val setExceptSql =
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      |EXCEPT
      |SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------
  private def scalarString(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("up_name"),
        length(col("c_name")).cast("long").as("name_len"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        concat(col("c_mktsegment"), lit(":"), col("c_name")).as("tagged"),
        regexp_replace(col("c_name"), "Customer#0*", "C").as("short_name"))
      .orderBy(col("c_custkey"))

  private val scalarStringSql =
    """SELECT c_custkey, upper(c_name) AS up_name,
      |  CAST(length(c_name) AS BIGINT) AS name_len,
      |  substring(c_name, 1, 8) AS name_prefix,
      |  c_mktsegment || ':' || c_name AS tagged,
      |  regexp_replace(c_name, 'Customer#0*', 'C', 'g') AS short_name
      |FROM customer ORDER BY c_custkey""".stripMargin

  private def scalarDate(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("order_year"),
        month(col("o_orderdate")).cast("long").as("order_month"),
        dayofmonth(col("o_orderdate")).cast("long").as("order_day"),
        quarter(col("o_orderdate")).cast("long").as("order_quarter"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        datediff(lit("2002-01-01").cast("date"), to_date(col("o_orderdate"))).cast("long").as("days_to_2002"))
      .orderBy(col("o_orderkey"))

  private val scalarDateSql =
    """SELECT o_orderkey,
      |  CAST(date_part('year', o_orderdate) AS BIGINT) AS order_year,
      |  CAST(date_part('month', o_orderdate) AS BIGINT) AS order_month,
      |  CAST(date_part('day', o_orderdate) AS BIGINT) AS order_day,
      |  CAST(date_part('quarter', o_orderdate) AS BIGINT) AS order_quarter,
      |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
      |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_to_2002
      |FROM orders ORDER BY o_orderkey""".stripMargin

  private def scalarMath(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .filter(col("l_orderkey") < 1000)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(abs(dec(col("l_extendedprice")) * lit(-1).cast("decimal(18,4)")), 2).cast("double").as("abs_price"),
        floor(col("l_quantity")).cast("long").as("qty_floor"),
        ceil(col("l_quantity")).cast("long").as("qty_ceil"),
        rnd(sqrt(col("l_quantity")), 4).as("qty_sqrt"),
        rnd(pow(col("l_discount"), 2), 6).as("disc_sq"),
        pmod(col("l_orderkey"), lit(7)).cast("long").as("key_mod7"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val scalarMathSql =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(round(abs(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(-1 AS DECIMAL(18,4))), 2) AS DOUBLE) AS abs_price,
      |  CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
      |  CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
      |  CAST(round(CAST(sqrt(l_quantity) AS DECIMAL(18,8)), 4) AS DOUBLE) AS qty_sqrt,
      |  CAST(round(CAST(pow(l_discount, 2) AS DECIMAL(18,8)), 6) AS DOUBLE) AS disc_sq,
      |  CAST(l_orderkey % 7 AS BIGINT) AS key_mod7
      |FROM lineitem WHERE l_orderkey < 1000
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  private def caseWhen(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
      .select(col("c_custkey"),
        when(col("c_acctbal") < 0, "negative")
          .when(col("c_acctbal") < 3000, "low")
          .when(col("c_acctbal") < 7000, "mid")
          .otherwise("high").as("bal_bucket"))
      .groupBy(col("bal_bucket"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("bal_bucket"))

  private val caseWhenSql =
    """SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
      |  WHEN c_acctbal < 3000 THEN 'low'
      |  WHEN c_acctbal < 7000 THEN 'mid'
      |  ELSE 'high' END AS bal_bucket,
      |  count(*) AS n_customers
      |FROM customer GROUP BY 1 ORDER BY bal_bucket""".stripMargin

  // explicit GROUPING SETS (beyond rollup/cube): two single-dimension
  // groupings plus the grand total in one pass.
  private def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "orders").createOrReplaceTempView("orders_gs")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  private val groupingSetsSql =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // the SQL entry point: the engine's queries are equally expressible
  // through spark.sql over registered views (same Catalyst plan).
  private def sqlQ6(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "lineitem").createOrReplaceTempView("lineitem_v")
    spark.sql(
      """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem_v
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 25""".stripMargin)
  }

  private val sqlQ6Sql =
    """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
      |       count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.03 AND 0.07
      |  AND l_quantity < 25""".stripMargin

  // array functions battery
  private def arrayFuncs(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "part")
      .withColumn("ws", split(col("p_name"), " "))
      .select(
        col("p_partkey"),
        size(col("ws")).cast("long").as("n_words"),
        col("ws").getItem(0).as("first_word"),
        array_join(array_sort(col("ws")), ",").as("sorted_words"),
        array_contains(col("ws"), "widget").as("has_widget"),
        array_join(slice(col("ws"), 1, 1), ",").as("sliced"))
      .orderBy(col("p_partkey"))

  private val arrayFuncsSql =
    """WITH t AS (SELECT p_partkey, string_split(p_name, ' ') AS ws FROM part)
      |SELECT p_partkey,
      |  CAST(len(ws) AS BIGINT) AS n_words,
      |  ws[1] AS first_word,
      |  array_to_string(list_sort(ws), ',') AS sorted_words,
      |  list_contains(ws, 'widget') AS has_widget,
      |  array_to_string(ws[1:1], ',') AS sliced
      |FROM t ORDER BY p_partkey""".stripMargin

  // JSON functions battery on the dynamic props column
  private def jsonFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        array_join(json_object_keys(col("props")), ",").as("props_keys"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        get_json_object(col("props"), "$.missing").isNull.as("missing_absent"))
      .orderBy(col("event_id"))

  private val jsonFuncsSql =
    """SELECT event_id,
      |  array_to_string(json_keys(props), ',') AS props_keys,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |  json_extract_string(props, '$.missing') IS NULL AS missing_absent
      |FROM events ORDER BY event_id""".stripMargin

  // Sketch internals (HLL registers, KLL buffers) differ per engine, so
  // the sketch outputs themselves can never hash-match an oracle. What
  // CAN be checked: the exact values, plus a boolean asserting each
  // sketch landed within its declared error bound — the oracle emits
  // literal TRUE, so a sketch drifting out of tolerance flips the hash.
  private def approxSketches(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id")).as("approx_users"),
        rnd(expr("percentile(value, 0.5D)"), 4).as("exact_median"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("approx_median"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) <= col("exact_users") * 0.15)
          .as("approx_users_ok"),
        col("exact_median"),
        (abs(col("approx_median") - col("exact_median")) <= abs(col("exact_median")) * 0.1 + 0.01)
          .as("approx_median_ok"))
      .orderBy(col("event_type"))

  private val approxSketchesSql =
    """SELECT event_type,
      |  count(DISTINCT user_id) AS exact_users,
      |  TRUE AS approx_users_ok,
      |  CAST(round(CAST(quantile_cont(value, 0.5) AS DECIMAL(18,8)), 4) AS DOUBLE) AS exact_median,
      |  TRUE AS approx_median_ok
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // generator/UDTF capability: explode over split words.
  private def explodeWords(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "part")
      .select(explode(split(col("p_name"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("word"))

  private val explodeWordsSql =
    """SELECT w AS word, count(*) AS n
      |FROM (SELECT unnest(string_split(p_name, ' ')) AS w FROM part)
      |GROUP BY w ORDER BY word""".stripMargin
}
