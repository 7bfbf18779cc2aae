package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Harness-table loaders (TESTDATA.md). Only `events` needs care: the
  * fixture generator has shipped its `ts` column in two layouts over
  * time — TIMESTAMP(NANOS) (which Spark 4 only reads as a nanosecond
  * long under `spark.sql.legacy.parquet.nanosAsLong=true`) and plain
  * `timestamp[us]` (read as TIMESTAMP_NTZ). The loader adapts to
  * whichever layout is on disk and always hands downstream operators
  * the same two columns: `ts` as a standard microsecond TimestampType
  * and `ts_ns` as a nanosecond long.
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
      { case (s, p) => SchemaDrift.adapt(name, s.read.parquet(p)) })

  /** Spread a scan across all cores before heavy per-row work — GATED
    * on the input's actual arriving partition count (r18 verdict #1).
    * The harness parquet files are written as a SINGLE row group, and a
    * row group is indivisible — whatever maxPartitionBytes says, one
    * task decodes the whole file, and everything pipelined on top of
    * the scan (explode, hashing, JSON codec) runs single-threaded; the
    * key-hash repartition buys full parallelism for the expensive stage
    * above it. But a repartition always inserts an Exchange, and on a
    * properly row-grouped production layout an unconditional
    * `fanOut(documents)` would shuffle the full corpus payload for
    * nothing — so when the scan already arrives in >=
    * defaultParallelism splits the helper is the identity and no
    * Exchange exists (the keyphraseRake pattern). Every call site hands
    * this a scan-level frame (project/filter over a parquet scan, no
    * exchanges or subqueries below), so `toRdd` here is pure split
    * planning — AQE does not wrap exchange-free plans and no job runs. */
  def fanOut(df: DataFrame, key: String = "doc_id"): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions >= par) df
    else df.repartition(par, col(key))
  }

  /** events with `ts` as TimestampType (µs) and `ts_ns` as a
    * nanosecond long, whichever layout the fixture carries. The session
    * timezone is UTC everywhere we build sessions, so the NTZ→TS cast
    * is a pure reinterpretation matching DuckDB's naive-as-UTC oracle
    * semantics. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) fixture surfaced as raw nanos
        raw
          .withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros((col("ts_ns") / 1000L).cast("long")))
      case _: TimestampType | _: TimestampNTZType => // timestamp[us] fixture
        raw
          .withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported fixture dtype $other (expected nanos-long or timestamp)")
    }
  }
}
