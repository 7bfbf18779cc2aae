package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** The incremental funnel must land on exactly the batch query's
  * conversion counts for a real ts-ordered micro-batched stream —
  * including users whose steps complete in DIFFERENT batches, which a
  * per-batch window can't see. */
class StreamFunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  // sf0.01: the smallest fixture where step-3 conversions exist, so
  // the hour-window leg is exercised, not just trivially empty
  val dir = "/root/testdata/sf0.01"

  test("streamed funnel states reproduce events_funnel_steps exactly") {
    val base = Files.createTempDirectory("sfunnel").toString
    val ev = graft.ops.Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_type"))
    // three ts-ordered micro-batches (value cuts never split a tie group)
    val Array(c1, c2) = ev.stat.approxQuantile("ts_us", Array(0.33, 0.66), 0.0)
    ev.filter(col("ts_us") <= c1).coalesce(1).write.parquet(s"$base/in/p1")
    ev.filter(col("ts_us") > c1 && col("ts_us") <= c2).coalesce(1).write.parquet(s"$base/in/p2")
    ev.filter(col("ts_us") > c2).coalesce(1).write.parquet(s"$base/in/p3")
    TestSpark.touch(s"$base/in/p1", 1000L)
    TestSpark.touch(s"$base/in/p2", 2000L)
    TestSpark.touch(s"$base/in/p3", 3000L)

    // latest state per user across the run
    val latest = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
    implicit val evEnc = org.apache.spark.sql.Encoders.product[StreamFunnel.Ev]
    val q = StreamFunnel.funnelStates(
        spark.readStream
          .schema(ev.schema)
          .option("maxFilesPerTrigger", "1")
          .option("recursiveFileLookup", "true")
          .parquet(s"$base/in")
          .as[StreamFunnel.Ev])
      .toDF()
      .writeStream
      .outputMode("update")
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.collect().foreach { r =>
          latest(r.getLong(0)) = (r.getLong(1), r.getLong(2), r.getLong(3))
        }
        ()
      }
      .trigger(Trigger.ProcessingTime(100))
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()

    import spark.implicits._
    val states = latest.toSeq.map { case (u, (t1, t2, t3)) => (u, t1, t2, t3) }
      .toDF("user_id", "t1", "t2", "t3")
    val streamed = StreamFunnel.funnelCounts(states).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val batch = graft.SparkEntry.queries("events_funnel_steps")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(streamed === batch,
      s"streamed funnel $streamed must equal the batch funnel $batch")
    // sanity: the funnel narrows and something converts
    val users = streamed.map(_._3)
    assert(users(0) >= users(1) && users(1) >= users(2) && users(2) > 0)
  }
}
