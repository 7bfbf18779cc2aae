package graft.pipeline

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** Event-time windowed aggregation with a watermark on a real
  * streaming query (SURVEY.md §2.6 streaming capability): the streamed
  * result over file micro-batches must equal the batch window
  * aggregation of the same data.
  */
class StreamingWindowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("watermarked tumbling window over a file stream == batch result") {
    val base = Files.createTempDirectory("stream-win").toString
    val events = graft.ops.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("ts"), col("event_type"), col("value"))
    // two files => two micro-batches
    events.filter(col("event_type") =!= "error").coalesce(1).write.parquet(s"$base/in/p1")
    events.filter(col("event_type") === "error").coalesce(1).write.parquet(s"$base/in/p2")

    val stream = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(s"$base/in")

    val agg = stream
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))

    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("win_out")
      .trigger(Trigger.ProcessingTime(100))
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.sql(
      "SELECT unix_timestamp(window.start) AS s, event_type, n FROM win_out")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("s"), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming exact dedup: dropDuplicates with watermark across micro-batches") {
    val base = Files.createTempDirectory("stream-dedup").toString
    val events = graft.ops.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("ts"), col("event_id"), col("user_id"))
    // duplicate delivery: the same rows land in two files
    events.limit(100).coalesce(1).write.parquet(s"$base/in/p1")
    events.limit(100).coalesce(1).write.parquet(s"$base/in/p2")

    val stream = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(s"$base/in")

    val q = stream
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("dedup_out")
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()

    // second delivery of the same 100 events must be suppressed
    assert(spark.sql("SELECT count(*) FROM dedup_out").collect().head.getLong(0) === 100L)
  }

  test("stream-static broadcast join enriches micro-batches (S5's set-oriented form)") {
    // the reference's batched point lookup (mongodb.ts:61-104) becomes a
    // stream-static join: each micro-batch joins the static dimension
    // in one broadcast pass, no per-row RPC
    val base = Files.createTempDirectory("stream-join").toString
    val events = graft.ops.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("ts"), col("event_id"), col("user_id"), col("event_type"))
    events.filter(col("event_id") % 2 === 0).coalesce(1).write.parquet(s"$base/in/p1")
    events.filter(col("event_id") % 2 === 1).coalesce(1).write.parquet(s"$base/in/p2")

    val dim = spark.createDataFrame(Seq(
      ("signup", "acquisition"), ("click", "engagement"), ("view", "engagement"),
      ("purchase", "revenue"), ("error", "ops"),
    )).toDF("event_type", "category")

    val stream = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(s"$base/in")

    val q = stream
      .join(broadcast(dim), Seq("event_type"), "left")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("enrich_out")
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()

    val got = spark.sql("SELECT count(*), count(category) FROM enrich_out").collect().head
    val want = events.count()
    assert(got.getLong(0) === want)  // every event survives the left join
    assert(got.getLong(1) === want)  // every event_type resolved a category
  }
}
