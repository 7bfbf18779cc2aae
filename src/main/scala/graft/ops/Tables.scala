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

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events with `ts` as TimestampType (µs, truncated from ns) and
    * `ts_ns` as the raw nanosecond long. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros((col("ts_ns") / 1000L).cast("long")))
  }
}
