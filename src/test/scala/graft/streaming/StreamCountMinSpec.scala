package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark
import graft.ops.CountMin

/** Streaming Count-Min counters must equal the batch sketch
  * bit-for-bit over the same events — including across a checkpoint
  * restart — and streaming point queries must reproduce the batch
  * audit's n_est column exactly.
  */
class StreamCountMinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  private def eventsDf = graft.ops.Tables.events(spark, dir)
    .select(col("event_id"), col("user_id"))

  private def latestCounters(sql: String): Map[(Int, Long), Long] =
    spark.sql(sql).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(t => (t._1, t._2))
      .view.mapValues(_.maxBy(_._4)._3).toMap

  private def batchMap(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Long] =
    StreamCountMin.batchCounters(df).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("drained stream counters equal batch counters bit-for-bit; estimates match the audit") {
    val base = Files.createTempDirectory("scm").toString
    eventsDf.filter(col("event_id") % 3 === 0).coalesce(1).write.parquet(s"$base/in/p1")
    eventsDf.filter(col("event_id") % 3 === 1).coalesce(1).write.parquet(s"$base/in/p2")
    eventsDf.filter(col("event_id") % 3 === 2).coalesce(1).write.parquet(s"$base/in/p3")
    TestSpark.touch(s"$base/in/p1", 1000L)
    TestSpark.touch(s"$base/in/p2", 2000L)
    TestSpark.touch(s"$base/in/p3", 3000L)

    val stream = spark.readStream
      .schema("event_id BIGINT, user_id BIGINT")
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(s"$base/in")
    val q = StreamCountMin.counters(stream)
      .writeStream.outputMode("update").format("memory")
      .queryName("scm_out")
      .trigger(Trigger.ProcessingTime(100))
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()

    // latest emission per cell = counter with the LARGEST count (update
    // mode re-emits a cell only when its count grew)
    val streamed = latestCounters(
      "SELECT d, cell, cnt, cnt AS ord FROM scm_out")
    val batch = batchMap(eventsDf)
    assert(streamed === batch, "drained counters must equal the batch sketch")
    // mass conservation: each depth's counters sum to the event total
    val nEvents = eventsDf.count()
    (0 until CountMin.depth).foreach { d =>
      val mass = streamed.collect { case ((`d`, _), c) => c }.sum
      assert(mass === nEvents, s"depth $d counter mass")
    }
    // point queries reproduce agg_countmin_audit's n_est exactly
    val audit = graft.SparkEntry.queries("agg_countmin_audit")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(audit.nonEmpty)
    audit.foreach { case (u, nExact, nEst) =>
      val est = CountMin.estimate(streamed, u)
      assert(est === nEst, s"user $u streamed estimate $est vs audit $nEst")
      assert(est >= nExact, s"user $u CM must never underestimate")
    }
  }

  test("counter state survives a checkpoint restart: counts continue, not restart") {
    val base = Files.createTempDirectory("scm_restart").toString

    def runUntilDrained(): Map[(Int, Long), Long] = {
      val latest = scala.collection.mutable.Map[(Int, Long), Long]()
      val q = StreamCountMin.counters(
          spark.readStream
            .schema("event_id BIGINT, user_id BIGINT")
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(s"$base/in"))
        .writeStream.outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => latest((r.getInt(0), r.getLong(1))) = r.getLong(2))
          ()
        }
        .trigger(Trigger.ProcessingTime(100))
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      q.processAllAvailable(); q.stop()
      latest.toMap
    }

    eventsDf.filter(col("event_id") < 500).coalesce(1).write.parquet(s"$base/in/p1")
    TestSpark.touch(s"$base/in/p1", 1000L)
    val run1 = runUntilDrained()
    eventsDf.filter(col("event_id") >= 500).coalesce(1).write.parquet(s"$base/in/p2")
    TestSpark.touch(s"$base/in/p2", 2000L)
    val run2 = runUntilDrained()

    val batch = batchMap(eventsDf)
    // run 2's view (run-1 cells it didn't re-touch keep run-1 values)
    val merged = run1 ++ run2
    assert(merged === batch, "post-restart counters must continue the persisted sums")
    assert(run1.values.sum < batch.values.sum,
      "run 1 must be partial or the restart proves nothing")
  }
}
