package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** Streaming gap-fill resampling: every sealed grid cell is emitted
  * exactly once — observed hours carry their last observation, gap
  * hours the forward-filled value; a silent user's fills flow through
  * the timer path while other users advance the watermark; gaps
  * backfill when a later observation extends the span; rows behind
  * the watermark are dropped without disturbing emitted cells. */
class StreamResampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def t(sec: Long) = new Timestamp(sec * 1000L)
  private def ev(sec: Long, u: Long, id: Long, v: Double) =
    StreamResample.Ev(t(sec), u, id, v)

  test("sealed cells emit once with forward fill, via both the input and timer paths") {
    import spark.implicits._
    val base = Files.createTempDirectory("streamresample").toString
    // batch 1: u1 twice in hour 10 (the later (sec, event_id) wins),
    // u2 once in hour 11 (u2's event also drives the initial watermark)
    Seq(ev(36100, 1L, 1L, 1.0), ev(36200, 1L, 2L, 2.0), ev(39700, 2L, 3L, 7.0))
      .toDS().coalesce(1).write.parquet(s"$base/in/p1")
    // batch 2: u1 again in hour 13 -> hour 10 seals for u1 on arrival
    Seq(ev(46850, 1L, 4L, 5.0))
      .toDS().coalesce(1).write.parquet(s"$base/in/p2")
    // batch 3: only u3 (hour 100) -> u1's hour-11 fill and u2's hour-11
    // cell must flow through their TIMERS as the watermark advances
    Seq(ev(360100, 3L, 5L, 9.0))
      .toDS().coalesce(1).write.parquet(s"$base/in/p3")
    // batch 4: u3 extends to hour 103; u1 gets a far-late row (hour 9,
    // far behind the watermark) that must be dropped
    Seq(ev(370900, 3L, 6L, 4.0), ev(32500, 1L, 7L, 8.8))
      .toDS().coalesce(1).write.parquet(s"$base/in/p4")
    // batch 5: u3 far ahead (hour 200) -> the span extends to 200 and
    // the same event's watermark seals through hour 198, so the whole
    // sealed prefix 100..198 emits: 101/102 backfilled from the
    // hour-100 observation, 104..198 from hour 103's
    Seq(ev(720000, 3L, 8L, 0.5))
      .toDS().coalesce(1).write.parquet(s"$base/in/p5")
    (1 to 5).foreach(i => graft.TestSpark.touch(s"$base/in/p$i", i * 1000L))

    graft.TestSpark.withRocksDB {
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[StreamResample.Ev]].schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(s"$base/in")
        .as[StreamResample.Ev]

      val q = StreamResample.cells(stream, lateSec = 60L)
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName("streamresample_out")
        .trigger(Trigger.ProcessingTime(100))
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      q.processAllAvailable()
      q.stop()
    }

    val got = spark.table("streamresample_out")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toSet
    val expected = Set(
      // u1: grid 10..13, hour-10 pick is the later in-hour event (2.0)
      (1L, 10L, 2.0, true),
      (1L, 11L, 2.0, false), // via timer while u1 silent
      (1L, 12L, 2.0, false),
      (1L, 13L, 5.0, true),
      // u2: single-observation grid
      (2L, 11L, 7.0, true),
      // u3: sealed prefix of its span — 100/103 observed, the rest
      // forward-filled; hours 199..200 are still open at stream end
      (3L, 100L, 9.0, true),
      (3L, 101L, 9.0, false),
      (3L, 102L, 9.0, false),
      (3L, 103L, 4.0, true),
    ) ++ (104L to 198L).map(h => (3L, h, 4.0, false))
    assert(got == expected, s"got ${got.toVector.sortBy(c => (c._1, c._2))}")
    // exactly once: no duplicate (user, hr) cells
    val cells = spark.table("streamresample_out").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cells.length == cells.distinct.length)
  }

  test("admissible out-of-order arrival BELOW the first-seen hour extends the grid downward") {
    import spark.implicits._
    val base = Files.createTempDirectory("streamresample3").toString
    // batch 1: u1's first event lands 10s into hour 10 -> watermark
    // 35950s, so hour 9 is NOT yet sealed
    Seq(ev(36010, 1L, 1L, 1.0))
      .toDS().coalesce(1).write.parquet(s"$base/in/p1")
    // batch 2: an ADMISSIBLE (>= watermark) event in hour 9 arrives —
    // the grid start must move down to hour 9, matching the batch
    // twin's [first observed, last observed] span
    Seq(ev(35980, 1L, 2L, 5.5))
      .toDS().coalesce(1).write.parquet(s"$base/in/p2")
    // batch 3: watermark driver seals through hour 12
    Seq(ev(50000, 2L, 3L, 0.0))
      .toDS().coalesce(1).write.parquet(s"$base/in/p3")
    (1 to 3).foreach(i => graft.TestSpark.touch(s"$base/in/p$i", i * 1000L))

    graft.TestSpark.withRocksDB {
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[StreamResample.Ev]].schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(s"$base/in")
        .as[StreamResample.Ev]
      val q = StreamResample.cells(stream, lateSec = 60L)
        .writeStream
        .outputMode("append").format("memory").queryName("streamresample3_out")
        .trigger(Trigger.ProcessingTime(100))
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      q.processAllAvailable()
      q.stop()
    }

    val got = spark.table("streamresample3_out")
      .filter("user_id = 1").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSet
    assert(got == Set((9L, 5.5, true), (10L, 1.0, true)),
      s"the hour-9 observation must emit, not vanish: got ${got.toVector.sortBy(_._1)}")
  }

  test("streamed staircase equals the batch resample on the sealed horizon") {
    import spark.implicits._
    val base = Files.createTempDirectory("streamresample2").toString
    // irregular, partly out-of-order traffic for one user across
    // hours 5, 6, 9 (hour 6 arrives before hour 5's second event)
    Seq(ev(18100, 1L, 1L, 3.0), ev(21700, 1L, 2L, 6.0), ev(18200, 1L, 3L, 4.0))
      .toDS().coalesce(1).write.parquet(s"$base/in/p1")
    Seq(ev(33000, 1L, 4L, 1.5))
      .toDS().coalesce(1).write.parquet(s"$base/in/p2")
    // watermark driver: seals everything through hour 9
    Seq(ev(90000, 2L, 5L, 0.0))
      .toDS().coalesce(1).write.parquet(s"$base/in/p3")
    Seq(ev(93600, 2L, 6L, 0.0))
      .toDS().coalesce(1).write.parquet(s"$base/in/p4")
    (1 to 4).foreach(i => graft.TestSpark.touch(s"$base/in/p$i", i * 1000L))

    graft.TestSpark.withRocksDB {
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[StreamResample.Ev]].schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(s"$base/in")
        .as[StreamResample.Ev]
      val q = StreamResample.cells(stream, lateSec = 60L)
        .writeStream
        .outputMode("append").format("memory").queryName("streamresample2_out")
        .trigger(Trigger.ProcessingTime(100))
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      q.processAllAvailable()
      q.stop()
    }

    val got = spark.table("streamresample2_out")
      .filter("user_id = 1").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSet
    // batch model over u1's events, grid 5..9: 5 -> last in-hour obs
    // 4.0 (sec 18200 > 18100), 6 -> 6.0, 7/8 fill 6.0, 9 -> 1.5
    val expected = Set(
      (5L, 4.0, true), (6L, 6.0, true),
      (7L, 6.0, false), (8L, 6.0, false), (9L, 1.5, true))
    assert(got == expected, s"got ${got.toVector.sortBy(_._1)}")
  }
}
