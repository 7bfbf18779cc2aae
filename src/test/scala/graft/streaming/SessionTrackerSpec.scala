package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** transformWithState sessionization: sessions are emitted exactly once,
  * exactly when the inactivity timer fires — events within the gap
  * extend the session (re-arming the timer), and closure waits for the
  * watermark to pass last-event + gap. */
class SessionTrackerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  test("sessions close on inactivity-gap timers, once each, with full aggregates") {
    import spark.implicits._
    val base = Files.createTempDirectory("sesstrack").toString
    // batch 1: user 1 starts a session; user 2 a singleton
    Seq(SessionTracker.Ev(t(100), 1L, 1.0), SessionTracker.Ev(t(150), 2L, 2.0))
      .toDS().coalesce(1).write.parquet(s"$base/in/p1")
    // batch 2: user 1's session extends within the 300s gap -> re-arm
    Seq(SessionTracker.Ev(t(200), 1L, 3.0))
      .toDS().coalesce(1).write.parquet(s"$base/in/p2")
    // batch 3: far-future event advances the watermark past both
    // sessions' (end + gap), firing their timers
    Seq(SessionTracker.Ev(t(2000), 3L, 9.9))
      .toDS().coalesce(1).write.parquet(s"$base/in/p3")
    // batch 4: one more so batch 3's watermark advance is acted on even
    // if no-data batches were disabled
    Seq(SessionTracker.Ev(t(2100), 3L, 0.1))
      .toDS().coalesce(1).write.parquet(s"$base/in/p4")
    def touch(dir: String, sec: Long): Unit = {
      val d = java.nio.file.Paths.get(dir)
      val s = java.nio.file.Files.list(d)
      try (java.util.stream.Stream.concat(java.util.stream.Stream.of(d), s)).forEach { p =>
        java.nio.file.Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(sec * 1000L))
      } finally s.close()
    }
    touch(s"$base/in/p1", 1000L)
    touch(s"$base/in/p2", 2000L)
    touch(s"$base/in/p3", 3000L)
    touch(s"$base/in/p4", 4000L)

    // transformWithState requires the RocksDB state store provider;
    // scope it to this query and restore the session default after
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[SessionTracker.Ev]].schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(s"$base/in")
        .as[SessionTracker.Ev]

      val q = SessionTracker.sessions(stream, gapSec = 300L, lateSec = 10L)
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName("sesstrack_out")
        .trigger(Trigger.ProcessingTime(100))
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      q.processAllAvailable()
      q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }

    val rows = spark.sql(
      "SELECT user_id, session_start, session_end, n_events, total_value FROM sesstrack_out")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getTimestamp(1).getTime / 1000, r.getTimestamp(2).getTime / 1000,
          r.getLong(3), r.getDouble(4))))
      .toMap
    // users 1 and 2 closed (watermark 1990 > end+gap); user 3 still open
    assert(rows.keySet === Set(1L, 2L))
    assert(rows(1L) === ((100L, 200L, 2L, 4.0)), "extended session spans both batches")
    assert(rows(2L) === ((150L, 150L, 1L, 2.0)), "singleton session")
  }
}
