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
    graft.TestSpark.touch(s"$base/in/p1", 1000L)
    graft.TestSpark.touch(s"$base/in/p2", 2000L)
    graft.TestSpark.touch(s"$base/in/p3", 3000L)
    graft.TestSpark.touch(s"$base/in/p4", 4000L)

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

  test("a gap wider than the window splits sessions on arrival, even within one batch") {
    import spark.implicits._
    val base = Files.createTempDirectory("sesssplit").toString
    // both events in ONE batch, 900s apart with a 300s gap: the close
    // must not wait for the watermark (no other traffic advances it)
    Seq(SessionTracker.Ev(t(100), 7L, 1.5), SessionTracker.Ev(t(1000), 7L, 2.5))
      .toDS().coalesce(1).write.parquet(s"$base/in/p1")

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[SessionTracker.Ev]].schema)
        .option("recursiveFileLookup", "true")
        .parquet(s"$base/in")
        .as[SessionTracker.Ev]
      val q = SessionTracker.sessions(stream, gapSec = 300L, lateSec = 10L)
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName("sesssplit_out")
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
      "SELECT session_start, session_end, n_events, total_value FROM sesssplit_out")
      .collect()
      .map(r => (r.getTimestamp(0).getTime / 1000, r.getTimestamp(1).getTime / 1000,
        r.getLong(2), r.getDouble(3)))
      .toSet
    // first session emitted on arrival of the out-of-gap event; the
    // second stays open (nothing advances the watermark past its close)
    assert(rows === Set((100L, 100L, 1L, 1.5)))
  }
}
