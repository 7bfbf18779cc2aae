package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Observation
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

final case class ObsEv(k: java.lang.Long, ts: Timestamp, v: String)

/** observe()-based metrics: aggregated inside the consuming job, read
  * from the Observation handle (batch) or progress.observedMetrics
  * (streaming) — never a second pass over the data. */
class ObservabilitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def t(sec: Long) = new Timestamp(sec * 1000L)

  private val evs = Seq(
    ObsEv(1L, t(100), "a"),
    ObsEv(null, t(200), "b"), // null key must be counted, not dropped
    ObsEv(3L, t(300), "c"),
  )

  test("batch metrics arrive on the Observation handle with the action") {
    import spark.implicits._
    val obs = Observation("quality")
    val out = Observability.observedBatch(evs.toDS().toDF(), obs, keyCol = "k", tsCol = "ts")
    assert(out.count() === 3)
    val m = obs.get
    assert(m("rows") === 3L)
    assert(m("null_keys") === 1L)
    assert(m("max_event_ts") === t(300))
  }

  test("streaming metrics surface per micro-batch in observedMetrics") {
    import spark.implicits._
    val base = Files.createTempDirectory("obs").toString
    evs.toDS().coalesce(1).write.parquet(s"$base/in/p1")
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[ObsEv]].schema)
      .option("recursiveFileLookup", "true").parquet(s"$base/in")
    val q = Observability.observedStream(stream, "quality", keyCol = "k", tsCol = "ts")
      .writeStream.outputMode("append").format("memory").queryName("obs_out")
      .trigger(Trigger.ProcessingTime(100))
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    q.processAllAvailable()
    val observed = q.recentProgress.flatMap(p => Option(p.observedMetrics.get("quality")))
    q.stop()
    assert(observed.nonEmpty, "no observedMetrics surfaced in any progress event")
    assert(observed.map(_.getAs[Long]("rows")).sum === 3L)
    assert(observed.map(_.getAs[Long]("null_keys")).sum === 1L)
  }
}
