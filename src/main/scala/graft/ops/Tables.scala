package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Harness-table loaders (TESTDATA.md). Only `events` needs care: its
  * parquet `ts` is TIMESTAMP(NANOS), which Spark 4 rejects unless
  * `spark.sql.legacy.parquet.nanosAsLong=true` turns it into a long of
  * nanoseconds; we normalize that to a microsecond `TimestampType`
  * column (plus the raw nanos) so downstream operators see a standard
  * timestamp.
  */
object Tables {

  // One DataFrame per (session, path): repeated loads of the same table
  // re-list the path and re-read parquet footers during analysis; the
  // memo hands every query the SAME analyzed relation, so per-query
  // planning starts from a warm logical plan (plans are immutable —
  // sharing is safe).
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, s"$dir/$name.parquet"),
      { case (s, p) => s.read.parquet(p) })

  /** Spread a scan across all cores before heavy per-row work. The
    * harness parquet files are written as a SINGLE row group, and a row
    * group is indivisible — whatever maxPartitionBytes says, one task
    * decodes the whole file, and everything pipelined on top of the scan
    * (explode, hashing, JSON codec) runs single-threaded. A round-robin
    * repartition of the (small) scan output buys full parallelism for
    * the expensive stage above it. On a real cluster with properly
    * row-grouped/bucketed files the scan splits by itself and this
    * becomes unnecessary — gate it on input layout, not a constant. */
  def fanOut(df: DataFrame, key: String = "doc_id"): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(key))

  /** events with `ts` as TimestampType (µs, truncated from ns) and
    * `ts_ns` as the raw nanosecond long. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros((col("ts_ns") / 1000L).cast("long")))
  }
}
