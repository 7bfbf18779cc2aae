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
    graft.TestSpark.withRocksDB {
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

  test("an admissible out-of-order event beyond the gap forms its own earlier session") {
    import spark.implicits._
    val base = Files.createTempDirectory("sessearly").toString
    // batch 1: the open session starts at t=1000 (watermark -> 400 with
    // lateSec=600, so t=500 and t=900 below are both admissible)
    Seq(SessionTracker.Ev(t(1000), 8L, 1.0))
      .toDS().coalesce(1).write.parquet(s"$base/in/p1")
    // batch 2, out of order: t=500 sits more than the 300s gap BEFORE
    // the open session's start -> its own span; t=900 is within the
    // gap -> merges into the open session. The early span must NOT
    // emit yet: with 600s lateness an event at ts in [400, 800] is
    // still admissible and could extend it.
    Seq(SessionTracker.Ev(t(500), 8L, 2.0), SessionTracker.Ev(t(900), 8L, 3.0))
      .toDS().coalesce(1).write.parquet(s"$base/in/p2")
    // batch 3: another user's event advances the watermark to 900 —
    // past the early span's close (500+300=800), NOT past the open
    // session's (1000+300=1300) — so exactly the early span seals
    Seq(SessionTracker.Ev(t(1500), 9L, 0.0))
      .toDS().coalesce(1).write.parquet(s"$base/in/p3")
    graft.TestSpark.touch(s"$base/in/p1", 1000L)
    graft.TestSpark.touch(s"$base/in/p2", 2000L)
    graft.TestSpark.touch(s"$base/in/p3", 3000L)

    graft.TestSpark.withRocksDB {
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[SessionTracker.Ev]].schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(s"$base/in")
      .as[SessionTracker.Ev]
    val q = SessionTracker.sessions(stream, gapSec = 300L, lateSec = 600L)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sessearly_out")
      .trigger(Trigger.ProcessingTime(100))
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
    }

    val rows = spark.sql(
      "SELECT user_id, session_start, session_end, n_events, total_value FROM sessearly_out")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000, r.getTimestamp(2).getTime / 1000,
        r.getLong(3), r.getDouble(4)))
      .toSet
    // only the early orphan closed — and only once the watermark proved
    // nothing admissible could still merge into it; the (merged)
    // 900..1000 session is still open awaiting its timer
    assert(rows === Set((8L, 500L, 500L, 1L, 2.0)))
  }

  test("a split span is NOT fragmented by a late merge: held until the watermark seals it") {
    import spark.implicits._
    val base = Files.createTempDirectory("sessfrag").toString
    // batch 1: open session at t=1000 (watermark -> 400 with lateSec=600)
    Seq(SessionTracker.Ev(t(1000), 8L, 1.0))
      .toDS().coalesce(1).write.parquet(s"$base/in/p1")
    // batch 2: out-of-order t=500 forms an earlier span (expiry 800)
    Seq(SessionTracker.Ev(t(500), 8L, 2.0))
      .toDS().coalesce(1).write.parquet(s"$base/in/p2")
    // batch 3: t=650 is admissible (>= wm 400) and within the gap of
    // the HELD early span (150s silence) but NOT of the open session
    // (350s silence > 300s gap) -> must merge into the held span, not
    // meet an already-emitted fragment
    Seq(SessionTracker.Ev(t(650), 8L, 4.0))
      .toDS().coalesce(1).write.parquet(s"$base/in/p3")
    // batch 4: advance the watermark past the merged span's close
    // (650+300=950) but not the open session's (1300): wm -> 1100
    Seq(SessionTracker.Ev(t(1700), 9L, 0.0))
      .toDS().coalesce(1).write.parquet(s"$base/in/p4")
    graft.TestSpark.touch(s"$base/in/p1", 1000L)
    graft.TestSpark.touch(s"$base/in/p2", 2000L)
    graft.TestSpark.touch(s"$base/in/p3", 3000L)
    graft.TestSpark.touch(s"$base/in/p4", 4000L)

    graft.TestSpark.withRocksDB {
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[SessionTracker.Ev]].schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(s"$base/in")
      .as[SessionTracker.Ev]
    val q = SessionTracker.sessions(stream, gapSec = 300L, lateSec = 600L)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sessfrag_out")
      .trigger(Trigger.ProcessingTime(100))
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
    }

    val rows = spark.sql(
      "SELECT user_id, session_start, session_end, n_events, total_value FROM sessfrag_out")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000, r.getTimestamp(2).getTime / 1000,
        r.getLong(3), r.getDouble(4)))
      .toSet
    // ONE merged session 500..650 — not a (500,500) fragment plus a
    // (650,650) leftover
    assert(rows === Set((8L, 500L, 650L, 2L, 6.0)))
  }

  test("state and timers survive a checkpoint restart (exactly-once sessions)") {
    import spark.implicits._
    val base = Files.createTempDirectory("sessrestart").toString
    // phase 1 (first query run): session opens and extends
    Seq(SessionTracker.Ev(t(100), 9L, 1.0))
      .toDS().coalesce(1).write.parquet(s"$base/in/p1")
    Seq(SessionTracker.Ev(t(200), 9L, 2.0))
      .toDS().coalesce(1).write.parquet(s"$base/in/p2")
    graft.TestSpark.touch(s"$base/in/p1", 1000L)
    graft.TestSpark.touch(s"$base/in/p2", 2000L)

    // the memory sink cannot recover from a checkpoint; the parquet
    // file sink is the fault-tolerant exactly-once path and the point
    // of this test
    def run(): Unit = graft.TestSpark.withRocksDB {
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[SessionTracker.Ev]].schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(s"$base/in")
        .as[SessionTracker.Ev]
      val q = SessionTracker.sessions(stream, gapSec = 300L, lateSec = 10L)
        .writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", s"$base/out")
        .trigger(Trigger.ProcessingTime(100))
        .option("checkpointLocation", s"$base/ckpt") // SAME checkpoint
        .start()
      q.processAllAvailable()
      q.stop()
    }

    run() // processes p1 + p2, then the query STOPS

    // phase 2: new files arrive while no query runs; the restarted query
    // must resume from the checkpointed state (open session 100..200)
    // and timers, not re-emit or lose it
    Seq(SessionTracker.Ev(t(2000), 10L, 9.9))
      .toDS().coalesce(1).write.parquet(s"$base/in/p3")
    Seq(SessionTracker.Ev(t(2100), 10L, 0.1))
      .toDS().coalesce(1).write.parquet(s"$base/in/p4")
    graft.TestSpark.touch(s"$base/in/p3", 3000L)
    graft.TestSpark.touch(s"$base/in/p4", 4000L)

    run()

    // the file sink holds the complete output across both runs: the
    // pre-restart session must close exactly once, with the aggregate
    // built from state recovered at restart
    val rows = spark.read.parquet(s"$base/out")
      .selectExpr("user_id", "session_start", "session_end", "n_events", "total_value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
        r.getTimestamp(2).getTime / 1000, r.getLong(3), r.getDouble(4)))
      .toSeq
    assert(rows.size === 1, s"exactly one session row, got $rows")
    assert(rows.head === ((9L, 100L, 200L, 2L, 3.0)),
      "the pre-restart session closes exactly once with its full aggregate")
  }

  test("a gap wider than the window splits sessions on arrival, even within one batch") {
    import spark.implicits._
    val base = Files.createTempDirectory("sesssplit").toString
    // both events in ONE batch, 900s apart with a 300s gap: the batch's
    // own watermark advance (to 1000-10=990, past the first span's 400
    // close) fires the timer — no other key's traffic needed
    Seq(SessionTracker.Ev(t(100), 7L, 1.5), SessionTracker.Ev(t(1000), 7L, 2.5))
      .toDS().coalesce(1).write.parquet(s"$base/in/p1")

    graft.TestSpark.withRocksDB {
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
