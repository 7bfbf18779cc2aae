package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The round-8 incident class: the driver regenerates fixtures with a
  * different physical schema and every consumer breaks at analysis.
  * These tests synthesize both `events.ts` layouts the harness has
  * shipped (TIMESTAMP(NANOS)-as-long and plain timestamp[us]) plus
  * numeric-width drifts, and pin that the load boundary adapts or fails
  * loudly with a named diff — never an analysis exception downstream. */
class SchemaDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("drift").toString

  // Three events at t = 1s, 2s, 3s past epoch (in nanos).
  private val nanos = Seq(1_000_000_000L, 2_000_000_000L, 3_500_000_000L)

  private def writeNanosLayout(dir: String): Unit =
    nanos.zipWithIndex
      .map { case (ns, i) => (i.toLong, ns, i.toLong, "t", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def writeMicrosLayout(dir: String): Unit =
    nanos.zipWithIndex
      .map { case (ns, i) => (i.toLong, ns / 1000, i.toLong, "t", 1.0, "{}") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros($"us").cast(TimestampNTZType))
      .drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("events loads identically from nanos-long and timestamp[us] fixtures") {
    val d1 = tmpDir(); val d2 = tmpDir()
    writeNanosLayout(d1); writeMicrosLayout(d2)
    val fromNanos = Tables.events(spark, d1)
      .select("event_id", "ts", "ts_ns").sort("event_id")
    val fromMicros = Tables.events(spark, d2)
      .select("event_id", "ts", "ts_ns").sort("event_id")
    assert(fromNanos.schema("ts").dataType == TimestampType)
    assert(fromMicros.schema("ts").dataType == TimestampType)
    assert(fromNanos.schema("ts_ns").dataType == LongType)
    assert(fromMicros.schema("ts_ns").dataType == LongType)
    assert(fromNanos.collect().toSeq == fromMicros.collect().toSeq)
    assert(fromMicros.select("ts_ns").as[Long].collect().toSeq.sorted ==
      nanos.map(ns => ns / 1000 * 1000).sorted) // µs-truncated nanos
  }

  test("the real harness events fixture loads and carries both columns") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.schema("ts_ns").dataType == LongType)
    val row = ev.select(unix_micros($"ts") * 1000L, $"ts_ns").first()
    assert(row.getLong(0) == row.getLong(1))
    assert(ev.limit(5).count() == 5)
  }

  test("integer-width drift is widened to the canonical type") {
    val dir = tmpDir()
    Seq((1, "a", "en", "web", 5), (2, "b", "en", "web", 7))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .select($"doc_id".cast(IntegerType).as("doc_id"), $"text", $"lang",
        $"source", $"n_chars".cast(IntegerType).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val df = Tables.table(spark, dir, "documents")
    assert(df.schema("doc_id").dataType == LongType)
    assert(df.schema("n_chars").dataType == LongType)
    assert(df.count() == 2)
  }

  test("timestamp tz-ness drift is cast to canonical, values preserved") {
    val dir = tmpDir()
    // o_orderdate as a zoned TimestampType (canonical is NTZ)
    Seq((1L, 10L, "O", 5.0, 1_700_000_000L, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "sec", "o_orderpriority")
      .withColumn("o_orderdate", timestamp_seconds($"sec")).drop("sec")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val df = Tables.table(spark, dir, "orders")
    assert(df.schema("o_orderdate").dataType == TimestampNTZType)
    // UTC session: zoned→NTZ is a pure reinterpretation of the instant
    assert(df.select($"o_orderdate".cast(TimestampType)).as[java.sql.Timestamp]
      .first().toInstant.getEpochSecond == 1_700_000_000L)
  }

  test("untolerated drift fails fast with a named per-column diff") {
    val dir = tmpDir()
    Seq((1L, 42L, "en", "web", 5L)) // text as a long: not tolerable
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalStateException](Tables.table(spark, dir, "documents"))
    assert(e.getMessage.contains("documents"))
    assert(e.getMessage.contains("text"))
    assert(e.getMessage.contains("bigint"))
  }

  test("missing column fails fast naming the column") {
    val dir = tmpDir()
    Seq((1L, "a")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalStateException](Tables.table(spark, dir, "documents"))
    assert(e.getMessage.contains("missing column"))
    assert(e.getMessage.contains("lang"))
  }

  test("unknown extra columns pass through untouched") {
    val dir = tmpDir()
    Seq((1L, "a", "en", "web", 1L, "extra"))
      .toDF("doc_id", "text", "lang", "source", "n_chars", "shard_hint")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val df = Tables.table(spark, dir, "documents")
    assert(df.schema.fieldNames.contains("shard_hint"))
  }
}
