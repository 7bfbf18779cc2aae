package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** In-flight Welford anomaly scoring: events are scored against the
  * running baseline of their predecessors only, the baseline carries
  * across micro-batches, and an outlier doesn't mask itself. */
class StreamAnomalySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  test("welford matches the two-pass mean/stddev on a reference sequence") {
    val xs = Vector(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0)
    // the PRODUCTION update (Welford.add), not an inline re-derivation
    val w = xs.foldLeft(StreamAnomaly.Welford(0L, 0.0, 0.0))(_.add(_))
    val mean = xs.sum / xs.size
    val varS = xs.map(x => (x - mean) * (x - mean)).sum / (xs.size - 1)
    assert(math.abs(w.mean - mean) < 1e-12)
    assert(math.abs(w.sampleVariance - varS) < 1e-12)
  }

  test("outliers flag against the pre-update baseline, across micro-batches") {
    import spark.implicits._
    val base = Files.createTempDirectory("sanomaly").toString
    // batch 1: five calm readings build the baseline (n=5 after this)
    Seq(10.0, 10.5, 9.5, 10.2, 9.8).zipWithIndex.map { case (v, i) =>
      StreamAnomaly.Ev(t(100 + i), 1L, i.toLong, v)
    }.toDS().coalesce(1).write.parquet(s"$base/in/p1")
    // batch 2: a wild spike (id 5), then a calm reading (id 6) — the
    // spike must flag, and must NOT have polluted its own baseline
    Seq(StreamAnomaly.Ev(t(200), 1L, 5L, 50.0), StreamAnomaly.Ev(t(201), 1L, 6L, 10.1))
      .toDS().coalesce(1).write.parquet(s"$base/in/p2")
    graft.TestSpark.touch(s"$base/in/p1", 1000L)
    graft.TestSpark.touch(s"$base/in/p2", 2000L)

    graft.TestSpark.withRocksDB {
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[StreamAnomaly.Ev]].schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(s"$base/in")
      .as[StreamAnomaly.Ev]
    // ttl = None: TimeMode.None lets processAllAvailable observe the
    // drained stream (the TTL variant's ProcessingTime trigger loop
    // never goes idle and must be driven by sink progress instead)
    val q = StreamAnomaly.scored(stream, zCut = 3.0, ttl = None)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sanomaly_out")
      .trigger(Trigger.ProcessingTime(100))
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
    }

    val rows = spark.sql(
      "SELECT event_id, n_baseline, z, is_outlier FROM sanomaly_out")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(rows.size === 7, "every event gets a scored row")
    // baseline-building events never flag (n < 5)
    (0L to 4L).foreach { id => assert(!rows(id)._3, s"event $id") }
    // the spike scores against the 5 calm readings and flags hard
    assert(rows(5L)._1 === 5L)
    assert(rows(5L)._3, s"spike must flag, z=${rows(5L)._2}")
    assert(rows(5L)._2 > 10.0)
    // the next calm reading sees n=6 (spike included in count) but the
    // spike widened sd so much that a calm value cannot flag
    assert(rows(6L)._1 === 6L)
    assert(!rows(6L)._3)
  }

  test("the TTL variant (ProcessingTime mode) scores identically, driven by sink progress") {
    import spark.implicits._
    val base = Files.createTempDirectory("sanomaly_ttl").toString
    (Seq(10.0, 10.5, 9.5, 10.2, 9.8).zipWithIndex.map { case (v, i) =>
      StreamAnomaly.Ev(t(100 + i), 1L, i.toLong, v)
    } :+ StreamAnomaly.Ev(t(200), 1L, 5L, 50.0))
      .toDS().coalesce(1).write.parquet(s"$base/in/p1")

    graft.TestSpark.withRocksDB {
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[StreamAnomaly.Ev]].schema)
      .option("recursiveFileLookup", "true")
      .parquet(s"$base/in")
      .as[StreamAnomaly.Ev]
    val q = StreamAnomaly.scored(stream, zCut = 3.0,
        ttl = Some(java.time.Duration.ofHours(1)))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sanomaly_ttl_out")
      .trigger(Trigger.ProcessingTime(100))
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    // the ProcessingTime trigger loop never goes idle, so await the
    // sink instead of processAllAvailable (see StreamAnomaly.scored)
    def emitted(): Long =
      spark.sql("SELECT count(*) FROM sanomaly_ttl_out").head().getLong(0)
    val deadline = System.currentTimeMillis() + 120000
    while (emitted() < 6 && System.currentTimeMillis() < deadline) Thread.sleep(200)
    q.stop()
    assert(emitted() === 6, "all six events scored")
    }
    val spike = spark.sql(
      "SELECT n_baseline, is_outlier FROM sanomaly_ttl_out WHERE event_id = 5").head()
    assert(spike.getLong(0) === 5L)
    assert(spike.getBoolean(1), "spike flags under the TTL variant too")
  }
}
