package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Registry.{dec, rnd}
import Tables.table

/** The deeper TPC-H patterns (Q2/Q7/Q8/Q9/Q11/Q13/Q15/Q16/Q17/Q20/
  * Q21/Q22 shapes — with these, all 22 TPC-H query shapes have an
  * analog in the suite), adapted to the harness schema (no partsupp
  * table, no commit/receipt dates — lateness is the q4/q12 house
  * definition `l_shipdate > o_orderdate + 60 days`). Each exercises a
  * distinct plan shape the rest of the suite lacks: per-key argmin
  * (Q2), two-sided dimension aliasing (Q7), conditional
  * share-of-total (Q8), multi-dimension profit rollup (Q9),
  * global-scalar HAVING (Q11), outer-join count distribution (Q13),
  * agg-max scalar selection (Q15), Expand-free distinct counting
  * (Q16), decorrelated per-group threshold (Q17), fraction-of-group
  * dominance + semi join (Q20), sole-cause attribution (Q21), and
  * scalar-subquery + anti-join prospect selection (Q22).
  *
  * Scale notes: the fact-side joins key on l_orderkey/o_custkey (the
  * minimum shuffles); nation/region/supplier and every derived
  * threshold/scalar are broadcast. Revenue sums route through
  * DECIMAL(18,4) (Registry.dec) for cross-engine determinism.
  */
object TpchDeep {

  def queries: Vector[NamedQuery] = Vector(
    NamedQuery("q7_volume_shipping", q7, Some(q7Sql)),
    NamedQuery("q8_market_share", q8, Some(q8Sql)),
    NamedQuery("q9_profit_by_nation", q9, Some(q9Sql)),
    NamedQuery("q13_order_distribution", q13, Some(q13Sql)),
    NamedQuery("q15_top_supplier", q15, Some(q15Sql)),
    NamedQuery("q17_small_qty_revenue", q17, Some(q17Sql)),
    NamedQuery("q21_late_sole_supplier", q21, Some(q21Sql)),
    NamedQuery("q22_dormant_prospects", q22, Some(q22Sql)),
    NamedQuery("q2_min_price_supplier", q2, Some(q2Sql)),
    NamedQuery("q16_supplier_variety", q16, Some(q16Sql)),
    NamedQuery("q11_revenue_concentration", q11, Some(q11Sql)),
    NamedQuery("q20_dominant_suppliers", q20, Some(q20Sql)),
  )

  private def revenueCol =
    dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec(col("l_discount")))

  /** nation⋈region restricted to the two trading regions, keyed and
    * named for one side of the trade — tiny, broadcast. */
  private def regionDim(spark: SparkSession, dir: String, keyAs: String, nameAs: String): DataFrame =
    table(spark, dir, "nation")
      .join(table(spark, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name").isin("EUROPE", "ASIA"))
      .select(col("n_nationkey").as(keyAs), col("r_name").as(nameAs))

  // ---------------------------------------------------------------
  // q7 (TPC-H Q7 shape): bilateral trade volume between two regions by
  // ship year. Both direction filters ride in on two aliased broadcast
  // copies of the nation⋈region dim (inner joins double as the pair
  // filter); the only shuffles are the lineitem⋈orders and
  // orders⋈customer key joins plus the final small aggregate.
  private def q7(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .filter(year(col("l_shipdate")).isin(1996, 1997))
      .join(table(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(table(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(table(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(regionDim(spark, dir, "sn_key", "supp_region")), col("s_nationkey") === col("sn_key"))
      .join(broadcast(regionDim(spark, dir, "cn_key", "cust_region")), col("c_nationkey") === col("cn_key"))
      .filter(col("supp_region") =!= col("cust_region"))
      .groupBy(col("supp_region"), col("cust_region"), year(col("l_shipdate")).as("l_year"))
      .agg(round(sum(revenueCol), 2).cast("double").as("revenue"))
      .orderBy(col("supp_region"), col("cust_region"), col("l_year"))

  private val q7Sql =
    """SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
      |  CAST(year(l_shipdate) AS INT) AS l_year,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      |WHERE r1.r_name IN ('EUROPE', 'ASIA') AND r2.r_name IN ('EUROPE', 'ASIA')
      |  AND r1.r_name <> r2.r_name
      |  AND year(l_shipdate) IN (1996, 1997)
      |GROUP BY r1.r_name, r2.r_name, CAST(year(l_shipdate) AS INT)
      |ORDER BY supp_region, cust_region, l_year""".stripMargin

  // ---------------------------------------------------------------
  // q8 (TPC-H Q8 shape): one nation's market share of ASIA-customer
  // revenue per order year. Conditional numerator + total in ONE
  // aggregate pass; the share divides the two rounded doubles so both
  // engines divide identical values.
  private def q8(spark: SparkSession, dir: String): DataFrame = {
    val asiaCust = broadcast(table(spark, dir, "nation")
      .join(table(spark, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .select(col("n_nationkey").as("cn_key")))
    val suppNation = broadcast(table(spark, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")))
    table(spark, dir, "lineitem")
      .join(table(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(table(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(asiaCust, col("c_nationkey") === col("cn_key"))
      .join(broadcast(table(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(suppNation, col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        round(sum(when(col("supp_nation") === "NATION_7", revenueCol)
          .otherwise(lit(0).cast("decimal(18,4)"))), 2).cast("double").as("nation_revenue"),
        round(sum(revenueCol), 2).cast("double").as("total_revenue"))
      .withColumn("mkt_share", rnd(col("nation_revenue") / col("total_revenue"), 6))
      .orderBy(col("o_year"))
  }

  private val q8Sql =
    """WITH s AS (
      |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |    CAST(round(sum(CASE WHEN n1.n_name = 'NATION_7'
      |      THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
      |      ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS nation_revenue,
      |    CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  JOIN region ON n2.n_regionkey = r_regionkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  WHERE r_name = 'ASIA'
      |  GROUP BY CAST(year(o_orderdate) AS INT)
      |)
      |SELECT o_year, nation_revenue, total_revenue,
      |  CAST(round(CAST(nation_revenue / total_revenue AS DECIMAL(18,8)), 6) AS DOUBLE) AS mkt_share
      |FROM s ORDER BY o_year""".stripMargin

  // ---------------------------------------------------------------
  // q9 (TPC-H Q9 shape): profit by supplier nation and order year for
  // one part family. No partsupp in the harness schema, so cost is the
  // retail-price proxy `0.1 * p_retailprice * l_quantity`; the product
  // is computed in double then pinned to DECIMAL(18,4) (exact at <= 3
  // decimals, so both engines round identically).
  private def q9(spark: SparkSession, dir: String): DataFrame = {
    val redParts = broadcast(table(spark, dir, "part")
      .filter(col("p_name").contains("red"))
      .select(col("p_partkey"), col("p_retailprice")))
    val suppNation = broadcast(table(spark, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("nation")))
    val amount = revenueCol -
      dec(col("p_retailprice") * col("l_quantity") * lit(0.1))
    table(spark, dir, "lineitem")
      .join(redParts, col("l_partkey") === col("p_partkey"))
      .join(table(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(table(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(suppNation, col("s_nationkey") === col("sn_key"))
      .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(round(sum(amount), 2).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  private val q9Sql =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
      |  CAST(round(sum(
      |    CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
      |    - CAST(p_retailprice * l_quantity * 0.1 AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%red%'
      |GROUP BY n_name, CAST(year(o_orderdate) AS INT)
      |ORDER BY nation, o_year DESC""".stripMargin

  // ---------------------------------------------------------------
  // q13 (TPC-H Q13 shape): distribution of customers by order count —
  // left outer join so zero-order customers land in the c_count = 0
  // bucket, then a second (tiny) aggregate over the counts. The
  // priority filter stands in for TPC-H's comment NOT LIKE.
  private def q13(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
      .join(table(spark, dir, "orders").filter(col("o_orderpriority") =!= "5-LOW"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  private val q13Sql =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer
      |  LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority <> '5-LOW') o
      |    ON c_custkey = o_custkey
      |  GROUP BY c_custkey
      |) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---------------------------------------------------------------
  // q15 (TPC-H Q15 shape): the top supplier(s) by revenue over one
  // quarter. The max is a one-row aggregate of the (already tiny)
  // per-supplier revenue, broadcast back as the selection key —
  // equality on identically-rounded doubles, so ties surface exactly
  // as in the oracle.
  private def q15(spark: SparkSession, dir: String): DataFrame = {
    val rev = table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(round(sum(revenueCol), 2).cast("double").as("total_revenue"))
    rev
      .join(broadcast(rev.agg(max(col("total_revenue")).as("mr"))), col("total_revenue") === col("mr"))
      .join(broadcast(table(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  private val q15Sql =
    """WITH revenue AS (
      |  SELECT l_suppkey,
      |    CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey
      |)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------
  // q17 (TPC-H Q17 shape): revenue from small-quantity lines of one
  // brand, annualized. The correlated `0.2 * avg(per part)` threshold
  // is written as its decorrelated form — per-part aggregate joined
  // back — which is exactly what Catalyst rewrites the subquery to;
  // the threshold rounds to DECIMAL scale 4 so the `<` compares
  // bit-identical values in both engines.
  private def q17(spark: SparkSession, dir: String): DataFrame = {
    val brandLines = table(spark, dir, "lineitem")
      .join(broadcast(table(spark, dir, "part")
        .filter(col("p_brand") === "Brand#13").select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
    val thresholds = brandLines
      .groupBy(col("l_partkey"))
      .agg(rnd(avg(dec(col("l_quantity"))) * lit(0.2), 4).as("qty_thr"))
    brandLines
      .join(broadcast(thresholds), Seq("l_partkey"))
      .filter(col("l_quantity") < col("qty_thr"))
      .agg(rnd(sum(dec(col("l_extendedprice"))).cast("double") / lit(7.0), 2).as("avg_yearly"))
  }

  private val q17Sql =
    """WITH li AS (
      |  SELECT l_partkey, l_quantity, l_extendedprice
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#13'
      |), thr AS (
      |  SELECT l_partkey,
      |    CAST(round(CAST(avg(CAST(l_quantity AS DECIMAL(18,4))) * 0.2 AS DECIMAL(18,8)), 4) AS DOUBLE) AS qty_thr
      |  FROM li GROUP BY l_partkey
      |)
      |SELECT CAST(round(CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 AS DECIMAL(18,8)), 2) AS DOUBLE) AS avg_yearly
      |FROM li JOIN thr USING (l_partkey)
      |WHERE l_quantity < qty_thr""".stripMargin

  // ---------------------------------------------------------------
  // q21 (TPC-H Q21 shape): suppliers solely responsible for a late
  // multi-supplier order. The reference formulation is EXISTS + NOT
  // EXISTS self-joins; the scale form used here folds both into ONE
  // grouped pass over the order's lines. Distinct-supplier counts come
  // from collect_set sizes, not countDistinct — two distinct aggs on
  // one grouping would Expand (double the fact rows) plus re-shuffle,
  // while the sets stay bounded by lines-per-order, so this is a
  // single l_orderkey exchange end to end — the right plan when
  // lineitem is the 100 TB fact.
  private def q21(spark: SparkSession, dir: String): DataFrame = {
    val lateSupp =
      when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), col("l_suppkey"))
    table(spark, dir, "lineitem")
      .join(table(spark, dir, "orders").filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(
        size(collect_set(col("l_suppkey"))).as("n_supp"),
        size(collect_set(lateSupp)).as("n_late_supp"),
        max(lateSupp).as("late_supp"))
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
      // group and tiebreak on the supplier KEY (the oracle twin must do
      // the same): grouping on s_name alone would merge two suppliers
      // that share a name, and a name-only sort leaves the LIMIT
      // boundary nondeterministic between engines
      .groupBy(col("late_supp"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(table(spark, dir, "supplier")), col("late_supp") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"), col("late_supp"))
      .orderBy(col("numwait").desc, col("s_name"), col("late_supp"))
      .limit(20)
  }

  private val q21Sql =
    """WITH per_order AS (
      |  SELECT l_orderkey,
      |    count(DISTINCT l_suppkey) AS n_supp,
      |    count(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN l_suppkey END) AS n_late_supp,
      |    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN l_suppkey END) AS late_supp
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'
      |  GROUP BY l_orderkey
      |)
      |SELECT s_name, count(*) AS numwait, late_supp
      |FROM per_order JOIN supplier ON late_supp = s_suppkey
      |WHERE n_supp >= 2 AND n_late_supp = 1
      |GROUP BY s_name, late_supp
      |ORDER BY numwait DESC, s_name, late_supp
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------
  // q22 (TPC-H Q22 shape): dormant high-balance prospects — customers
  // in three segments with above-average positive balance and no order
  // since 2000 (the harness has no phone prefixes, and "never ordered
  // at all" is empty at sf0.001, so dormancy is date-bounded). The
  // global average is a broadcast one-row scalar; the dormancy test is
  // an anti join against the pre-filtered recent-orders keys.
  private def q22(spark: SparkSession, dir: String): DataFrame = {
    val avgBal = broadcast(table(spark, dir, "customer")
      .filter(col("c_acctbal") > 0)
      .agg(rnd(avg(dec(col("c_acctbal"))), 4).as("ab")))
    val recent = table(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("2000-01-01"))
      .select(col("o_custkey"))
    table(spark, dir, "customer")
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY", "AUTOMOBILE"))
      .crossJoin(avgBal)
      .filter(col("c_acctbal") > col("ab"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("numcust"),
        round(sum(dec(col("c_acctbal"))), 2).cast("double").as("totacctbal"))
      .orderBy(col("c_mktsegment"))
  }

  private val q22Sql =
    """SELECT c_mktsegment, count(*) AS numcust,
      |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
      |  AND c_acctbal > (
      |    SELECT CAST(round(CAST(avg(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(18,8)), 4) AS DOUBLE)
      |    FROM customer WHERE c_acctbal > 0)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------
  // q2 (TPC-H Q2 shape): per-part argmin — the cheapest supplier of
  // each small part. No partsupp, so "cost" is the supplier's average
  // sold price for the part. The small-part predicate is applied as a
  // broadcast join BELOW the aggregation: per-partkey groups are
  // independent, so pruning partkeys first yields bit-identical
  // surviving groups while the shuffle and the aggregate run on the
  // ~1/5 of lineitem that can still reach the output (sf0.1 steady:
  // 1.75 s with the old filter-after-aggregate shape → 0.74 s; at
  // 100 TB the pushdown is the difference between shuffling the corpus
  // and shuffling the answer's inputs). The argmin is a partition-wide window
  // min over the (partkey, suppkey) averages — NOT a min-aggregate
  // joined back, which would compute the aggregate twice (Spark
  // doesn't materialize shared subplans); the explicit l_partkey
  // repartition makes the aggregate and the window
  // cluster-compatible, so the whole argmin is one exchange and one
  // partition-local sort. p_brand rides through the aggregate as a
  // grouping column (functionally dependent on partkey) instead of a
  // second join. Ties keep every minimal supplier, exactly as the
  // oracle's filter does; averages round to scale 2 so the equality
  // compares identical doubles in both engines.
  private def q2(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
    table(spark, dir, "lineitem")
      .join(broadcast(table(spark, dir, "part")
        .filter(col("p_size") <= 10).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .repartition(col("l_partkey"))
      .groupBy(col("l_partkey"), col("p_brand"), col("l_suppkey"))
      .agg(round(avg(dec(col("l_extendedprice"))), 2).cast("double").as("avg_price"))
      .withColumn("min_price", min(col("avg_price")).over(w))
      .filter(col("avg_price") === col("min_price"))
      .join(broadcast(table(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey").as("p_partkey"), col("p_brand"), col("s_name"), col("avg_price"))
      .orderBy(col("p_partkey"), col("s_name"))
      .limit(100)
  }

  private val q2Sql =
    """WITH per_supp AS (
      |  SELECT l_partkey, l_suppkey,
      |    CAST(round(avg(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS avg_price
      |  FROM lineitem
      |  GROUP BY l_partkey, l_suppkey
      |), min_part AS (
      |  SELECT l_partkey, min(avg_price) AS min_price FROM per_supp GROUP BY l_partkey
      |)
      |SELECT p_partkey, p_brand, s_name, avg_price
      |FROM per_supp
      |JOIN min_part USING (l_partkey)
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |WHERE avg_price = min_price AND p_size <= 10
      |ORDER BY p_partkey, s_name
      |LIMIT 100""".stripMargin

  // ---------------------------------------------------------------
  // q16 (TPC-H Q16 shape): supplier variety per part attribute slice —
  // how many distinct suppliers shipped each (brand, size) outside one
  // excluded brand. A single distinct aggregate plans as the two-phase
  // partial-distinct HashAggregate (no Expand — that only appears with
  // two+ distinct columns, see q21), so the dedup happens map-side
  // before the (p_brand, p_size) shuffle.
  private def q16(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .join(broadcast(table(spark, dir, "part").filter(col("p_brand") =!= "Brand#13")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))

  private val q16Sql =
    """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#13'
      |GROUP BY p_brand, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin

  // ---------------------------------------------------------------
  // q11 (TPC-H Q11 shape): revenue concentration — parts whose revenue
  // exceeds a fraction of the total. No partsupp, so "value" is part
  // revenue. The global total sums the SAME rounded per-part values
  // the filter reads, broadcast as a one-row scalar. Spark will not
  // share a subplan between the two consumers, so the part-sized
  // intermediate is localCheckpointed: lineitem aggregates ONCE and the
  // total becomes a trivial second pass over k rows (the same
  // discipline the k-means loop and the sampling queries use). The
  // relative threshold makes the query meaningful at any scale factor,
  // and both engines compare bit-identical doubles (same rounded
  // operands, same IEEE multiply).
  private def q11(spark: SparkSession, dir: String): DataFrame = {
    // fanOut: the DECIMAL revenue multiply-sum is this query's real
    // cost (probed: 0.74 s serial in the single scan task vs 0.40 s
    // spread — the exchange carries 3 narrow columns) and unlike q1 it
    // cannot be pruned away downstream because the threshold filter
    // consumes the sums; the l_partkey hash also feeds the groupBy its
    // partitioning (guide §2.5)
    val perPart = Tables.fanOut(table(spark, dir, "lineitem")
        .select(col("l_partkey"), col("l_extendedprice"), col("l_discount")), "l_partkey")
      .groupBy(col("l_partkey"))
      .agg(round(sum(revenueCol), 2).cast("double").as("part_value"))
    // the grand total ALSO routes through DECIMAL: a raw double sum is
    // association-order dependent, and the threshold filter would then
    // compare against a value that can differ between engines/runs.
    // One-pass form (r18, guide §2.4): the total rides an empty-frame
    // window over the part-keyed aggregate instead of the old eager
    // localCheckpoint + agg + BroadcastNestedLoopJoin — perPart is
    // computed once, and the single-partition window touches only the
    // ~|parts| aggregate rows (a bounded dimension-sized frame), not
    // the corpus. Same DECIMAL summation, same values.
    import org.apache.spark.sql.expressions.Window
    perPart
      .withColumn("total_value",
        round(sum(dec(col("part_value"))).over(Window.partitionBy()), 2)
          .cast("double"))
      .filter(col("part_value") > lit(0.0002) * col("total_value"))
      .withColumn("share", rnd(col("part_value") / col("total_value"), 6))
      .select(col("l_partkey"), col("part_value"), col("share"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  private val q11Sql =
    """WITH per_part AS (
      |  SELECT l_partkey,
      |    CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS part_value
      |  FROM lineitem
      |  GROUP BY l_partkey
      |), t AS (
      |  SELECT CAST(round(sum(CAST(part_value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value FROM per_part
      |)
      |SELECT l_partkey, part_value,
      |  CAST(round(CAST(part_value / total_value AS DECIMAL(18,8)), 6) AS DOUBLE) AS share
      |FROM per_part, t
      |WHERE part_value > 0.0002 * total_value
      |ORDER BY part_value DESC, l_partkey""".stripMargin

  // ---------------------------------------------------------------
  // q20 (TPC-H Q20 shape): suppliers who dominate a part family — a
  // supplier qualifies when its 1996 shipments of a blue part exceed
  // half that part's total 1996 shipments. The per-(part, supplier)
  // quantities and the per-part total share one l_partkey window
  // partitioning (the q2 pattern); quantities are integral so the
  // half-of-total comparison is exact in both engines. The qualifying
  // supplier set then semi-joins the supplier dim.
  private def q20(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
    val dominant = table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01"))
      .join(broadcast(table(spark, dir, "part")
        .filter(col("p_name").contains("blue")).select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .repartition(col("l_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("supp_qty"))
      .withColumn("part_qty", sum(col("supp_qty")).over(w))
      .filter(col("supp_qty") > lit(0.5) * col("part_qty"))
      .select(col("l_suppkey")).distinct()
    table(spark, dir, "supplier")
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  private val q20Sql =
    """WITH per_supp AS (
      |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE '%blue%'
      |    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  GROUP BY l_partkey, l_suppkey
      |), dom AS (
      |  SELECT DISTINCT l_suppkey FROM (
      |    SELECT l_suppkey, supp_qty, sum(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty
      |    FROM per_supp) x
      |  WHERE supp_qty > 0.5 * part_qty
      |)
      |SELECT s_suppkey, s_name
      |FROM supplier
      |WHERE EXISTS (SELECT 1 FROM dom WHERE l_suppkey = s_suppkey)
      |ORDER BY s_suppkey""".stripMargin
}
