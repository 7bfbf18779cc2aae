package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) multi-dimensional clustering.
  *
  * Why this is an *operator* and not a storage detail: at 100 TB the
  * dominant cost of every selective query is how many parquet row
  * groups the scan can prune, and min/max footer pruning only works on
  * dimensions the file layout is clustered by. A single-column sort
  * clusters one dimension; interleaving the bits of two (or more) key
  * columns into one Morton key and sorting by THAT gives every file a
  * tight min/max rectangle in *all* interleaved dimensions at once —
  * predicates on either column prune files. The write-side recipe is
  * `repartitionByRange(z).sortWithinPartitions(z)` before the parquet
  * write (LayoutSpec demonstrates it against real files); this query
  * measures the clustering quality the key achieves.
  *
  * The z-value is pure integer arithmetic (quantize each key to 8 bits
  * by an affine min/max map, then interleave the bits), so it is a
  * codegen'd projection — no UDF, no shuffle — and the identical
  * formula runs on both engines (Spark `div`, DuckDB `//`).
  *
  * `layout_zorder_stats` contrasts the two layouts directly: bucket
  * rows 64 ways by (a) Morton-key range — the z-sorted file layout —
  * and (b) `l_orderkey` range — the natural insertion-order layout —
  * and reports each bucket's bounding rectangle in quantized
  * (part, supp) space. Z buckets land near the 32×32 ideal;
  * insertion buckets span the full 256×256 plane (no pruning power on
  * either dimension). Shape: one 1-row bounds aggregate (broadcast),
  * then two partial-aggregate shuffles of 64 groups each — nothing in
  * the plan grows super-linearly with the table.
  */
object Layout {

  def queries: Vector[NamedQuery] = Vector(
    NamedQuery("layout_zorder_stats", zorderStats, Some(zorderStatsSql)),
    NamedQuery("layout_shard_skew", shardSkew, Some(shardSkewSql)),
    NamedQuery("join_bucketed_colocated", bucketedJoin, Some(bucketedJoinSql)),
    NamedQuery("layout_partition_pruning", partitionPruning, Some(partitionPruningSql)),
  )

  // ---------------------------------------------------------------
  // Partition pruning — the third leg of the layout triad (directory
  // partitioning / Z-order / bucketing): events re-laid-out as
  // `event_type=<v>/` directories (Hive-style, built once per corpus —
  // the bucketed-join fixture discipline), so a predicate on the
  // partition column never OPENS the other partitions' files — the
  // listing prunes them (PlanSpec pins a non-empty PartitionFilters
  // and that the pushed data filter reaches the scan). At 100 TB this
  // is the first line of IO defense: a selective event_type predicate
  // reads 1/|types| of the bytes before any row group or page logic
  // runs. The oracle runs the same aggregate over the flat parquet —
  // layout never changes answers.
  private def ensurePartitioned(spark: SparkSession, dir: String): String = {
    val tbl = ("graft_part_events_" + dir).replaceAll("[^A-Za-z0-9]", "_")
    if (!bucketedReady.contains(tbl)) {
      val src = Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      val fresh = spark.catalog.tableExists(tbl) &&
        spark.table(tbl).count() == src.count()
      if (!fresh) {
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
        val loc = new java.io.File(wh, tbl)
        if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
        src.write.partitionBy("event_type").format("parquet").saveAsTable(tbl)
      }
      bucketedReady.add(tbl)
    }
    tbl
  }

  private def partitionPruning(spark: SparkSession, dir: String): DataFrame =
    spark.table(ensurePartitioned(spark, dir))
      .filter(col("event_type") === "purchase" && col("value") > 10.0)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        Registry.sumDec2(col("value")).as("sum_value"))
      .orderBy(col("event_type"))

  private val partitionPruningSql =
    """SELECT event_type, count(*) AS n,
      |  count(DISTINCT user_id) AS n_users,
      |  CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE event_type = 'purchase' AND value > 10.0
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------
  // Co-located bucketed join — the OTHER half of the layout story next
  // to Z-order's scan pruning: pre-bucketing both join sides on the
  // join key (bucketBy + sortBy at write time) lets the SortMergeJoin
  // consume the bucket layout directly — NO Exchange on either side,
  // no shuffle of the fact table at all (PlanSpec pins both). At
  // 100 TB this is THE fact⋈fact pattern: the shuffle a plain
  // lineitem⋈orders join pays on every run is paid ONCE at write time
  // and amortized across every subsequent join on that key. The
  // bucketed tables build once per (dir) as session tables (the
  // cdc_bucketed_state fixture discipline — an existing table with the
  // right row count is reused, across sessions too); the oracle runs
  // the same join over the plain parquet — layout must never change
  // answers.
  private val bucketedReady =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def ensureBucketed(spark: SparkSession, dir: String,
      name: String, key: String): String = {
    val tbl = ("graft_bkt_" + name + "_" + dir).replaceAll("[^A-Za-z0-9]", "_")
    if (!bucketedReady.contains(tbl)) {
      val src = Tables.table(spark, dir, name)
      val fresh = spark.catalog.tableExists(tbl) &&
        spark.table(tbl).count() == src.count()
      if (!fresh) {
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        // a stale warehouse directory from a torn-down previous session
        // (table gone from THIS catalog, files still on disk) blocks
        // the managed-table create — clear it first
        val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
        val loc = new java.io.File(wh, tbl)
        if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
        src.write.bucketBy(8, key).sortBy(key).format("parquet").saveAsTable(tbl)
      }
      bucketedReady.add(tbl)
    }
    tbl
  }

  /** Bench warm hook (the cdc_bucketed_state fixture discipline): the
    * write-time bucketing is pre-paid deployment layout, not per-query
    * cost, so the bench builds it inside the fixture-warm window. */
  def warmBucketedFixture(spark: SparkSession, dir: String): Unit = {
    ensureBucketed(spark, dir, "lineitem", "l_orderkey")
    ensureBucketed(spark, dir, "orders", "o_orderkey")
    ()
  }

  /** Same for the Hive-partitioned events layout. */
  def warmPartitionedFixture(spark: SparkSession, dir: String): Unit = {
    ensurePartitioned(spark, dir); ()
  }

  private def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val l = spark.table(ensureBucketed(spark, dir, "lineitem", "l_orderkey"))
    val o = spark.table(ensureBucketed(spark, dir, "orders", "o_orderkey"))
    // MERGE hint: at bench SFs the orders side fits a broadcast and
    // Catalyst rightly picks BHJ — but the operator exists to pin the
    // fact⋈fact shape where NEITHER side broadcasts (the 100 TB case),
    // so force the strategy the big case picks naturally and assert
    // the bucket layout feeds it exchange-free
    l.hint("merge").join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        Registry.sumDec2(col("l_quantity")).as("sum_qty"))
      .orderBy(col("o_orderpriority"))
  }

  private val bucketedJoinSql =
    """SELECT o_orderpriority, count(*) AS n_lines,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Morton interleave of two pre-quantized 8-bit values as an integer
    * arithmetic expression: bit i of `qp` lands at position 2i+1, bit i
    * of `qs` at 2i. `idiv` is the engine's integer-division operator
    * (`div` for Spark SQL, `//` for DuckDB). */
  def mortonExpr(qp: String, qs: String, idiv: String): String =
    mortonExprN(Seq(qp, qs), idiv)

  /** N-dimensional Morton interleave of pre-quantized 8-bit values:
    * bit i of dimension j lands at position `N*i + (N-1-j)` (dimension
    * 0 most significant within each bit group — the 2-D form above is
    * the N=2 case). 100 TB layouts routinely cluster 3-4 dimensions;
    * the prefix property (truncating one bit per dimension truncates N
    * bits of z, so z-ranges are quantized hyper-rectangles) holds for
    * any N, which is what file/row-group pruning relies on. 8 bits × N
    * dims must fit a long: N ≤ 7. */
  def mortonExprN(qs: Seq[String], idiv: String): String = {
    require(qs.nonEmpty && qs.size <= 7, s"morton supports 1..7 dims, got ${qs.size}")
    val n = qs.size
    (0 until 8).flatMap { i =>
      val p2 = 1L << i
      qs.zipWithIndex.map { case (q, j) =>
        s"(($q $idiv $p2) % 2) * ${1L << (n * i + (n - 1 - j))}"
      }
    }.mkString("(", " + ", ")")
  }

  /** lineitem with quantized part/supp keys and the Morton key, bounds
    * computed by a broadcast 1-row aggregate. Reused by LayoutSpec's
    * real-file demonstration. */
  private[graft] def withZ(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    val bounds = li.agg(
      min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
      min("l_suppkey").as("smin"), max("l_suppkey").as("smax"),
      min("l_orderkey").as("omin"), max("l_orderkey").as("omax"))
    li.crossJoin(broadcast(bounds))
      // bigint affine map: an IntegerType key with range > 2^31/255
      // would wrap the *255 under non-ANSI eval (same guard as
      // LayoutWriter.zordered)
      .withColumn("qp", expr("((cast(l_partkey as bigint) - pmin) * 255L) div greatest(cast(pmax as bigint) - pmin, 1)"))
      .withColumn("qs", expr("((cast(l_suppkey as bigint) - smin) * 255L) div greatest(cast(smax as bigint) - smin, 1)"))
      .withColumn("z", expr(mortonExpr("qp", "qs", "div")))
  }

  private def zorderStats(spark: SparkSession, dir: String): DataFrame = {
    val z = withZ(spark, dir)
    def bucketStats(df: DataFrame, layout: String, bucket: Column): DataFrame =
      df.withColumn("bucket", bucket)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          (max(col("qp")) - min(col("qp"))).as("p_span"),
          (max(col("qs")) - min(col("qs"))).as("s_span"))
        .withColumn("layout", lit(layout))
    val byZ = bucketStats(z, "zorder", expr("z div 1024"))
    val byInsertion = bucketStats(
      z, "insertion", expr("((l_orderkey - omin) * 63) div greatest(omax - omin, 1)"))
    byZ.unionByName(byInsertion)
      .select(col("layout"), col("bucket"), col("n"), col("p_span"), col("s_span"))
      .orderBy(col("layout"), col("bucket"))
  }

  // ---------------------------------------------------------------
  // Shard-skew audit — the pre-flight check before any distributed
  // write: hash documents into 64 shards (md5 of the doc id, the
  // split_assign slice family) and report each shard's doc and token
  // mass against the mean. A load_factor far from 1.0 means a straggler
  // shard at write AND read time; with a uniform hash the factors
  // concentrate near 1, and any systematic drift here catches a broken
  // key long before a 100 TB job does.
  //
  // Scale shape: ONE map-side-combinable pass reduces the corpus to 64
  // rows; the mean rides a window over those 64. Determinism: masses
  // are exact integers, the load factor is one snapped division.
  private def shardSkew(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val sharded = graft.ops.Tables.table(spark, dir, "documents")
      .select(expr("cast(conv(substring(md5(cast(doc_id AS string)), 1, 8), 16, 10) AS bigint) % 64")
        .as("shard"), col("n_chars"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    sharded
      .withColumn("mean_chars",
        sum(col("chars")).over(wAll).cast("double") / count(lit(1)).over(wAll))
      .select(col("shard"), col("n_docs"), col("chars"),
        graft.ops.Registry.rnd(col("chars").cast("double") / col("mean_chars"), 4)
          .as("load_factor"))
      .orderBy(col("shard"))
  }

  private val shardSkewSql =
    """WITH s AS (
      |  SELECT CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 64 AS BIGINT) AS shard,
      |    n_chars
      |  FROM documents
      |), g AS (
      |  SELECT shard, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
      |  FROM s GROUP BY shard
      |), m AS (
      |  SELECT *, CAST(sum(chars) OVER () AS DOUBLE) / count(*) OVER () AS mean_chars FROM g
      |)
      |SELECT shard, n_docs, chars,
      |  CAST(round(CAST(CAST(chars AS DOUBLE) / mean_chars AS DECIMAL(18,8)), 4) AS DOUBLE) AS load_factor
      |FROM m ORDER BY shard""".stripMargin

  private val zorderStatsSql = {
    val morton = mortonExpr("qp", "qs", "//")
    s"""WITH b AS (
      |  SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
      |    min(l_suppkey) AS smin, max(l_suppkey) AS smax,
      |    min(l_orderkey) AS omin, max(l_orderkey) AS omax
      |  FROM lineitem
      |), q AS (
      |  SELECT l_orderkey, omin, omax,
      |    ((CAST(l_partkey AS BIGINT) - pmin) * 255) // greatest(CAST(pmax AS BIGINT) - pmin, 1) AS qp,
      |    ((CAST(l_suppkey AS BIGINT) - smin) * 255) // greatest(CAST(smax AS BIGINT) - smin, 1) AS qs
      |  FROM lineitem, b
      |), z AS (
      |  SELECT *, $morton AS z FROM q
      |), byz AS (
      |  SELECT 'zorder' AS layout, z // 1024 AS bucket, count(*) AS n,
      |    max(qp) - min(qp) AS p_span, max(qs) - min(qs) AS s_span
      |  FROM z GROUP BY 2
      |), byo AS (
      |  SELECT 'insertion' AS layout,
      |    ((l_orderkey - omin) * 63) // greatest(omax - omin, 1) AS bucket,
      |    count(*) AS n, max(qp) - min(qp) AS p_span, max(qs) - min(qs) AS s_span
      |  FROM z GROUP BY 2
      |)
      |SELECT layout, bucket, n, p_span, s_span FROM (
      |  SELECT * FROM byz UNION ALL SELECT * FROM byo
      |) ORDER BY layout, bucket""".stripMargin
  }
}
