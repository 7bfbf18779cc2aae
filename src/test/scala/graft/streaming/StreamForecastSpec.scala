package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Streaming forecast monitor: every sealed hour emits exactly once
  * per type with the dense count, the integer 2^-k WMA forecast and
  * all three error legs — equal to the batch twin's arithmetic over
  * the zero-extended span; silent types keep emitting zeros through
  * the timer path; warm-up hours carry None forecasts.
  */
class StreamForecastSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  test("sealed hours emit once; forecasts equal the batch formulas over the zero-extended span") {
    import spark.implicits._
    val base = Files.createTempDirectory("streamforecast").toString
    var id = 0L
    def evs(tpe: String, hours: Range, countOf: Long => Long): Seq[StreamForecast.Ev] =
      hours.flatMap { h =>
        (1L to countOf(h.toLong)).map { i =>
          id += 1; StreamForecast.Ev(t(h * 3600L + 10 * i), id, tpe)
        }
      }
    // type a: hours 0..27 with count h%5 (hour 0,5,10,... are silent);
    // type b: one event in each of hours 2 and 3, silent after
    val p1 = evs("a", 0 until 10, _ % 5) ++ evs("b", 2 to 3, _ => 1L)
    val p2 = evs("a", 10 until 20, _ % 5)
    val p3 = evs("a", 20 until 28, _ % 5)
    // p4/p5: far-future traffic on type a only — p5's trigger runs with
    // watermark = 40h - 60s, sealing hour 38 for BOTH types (b's zeros
    // must flow through its timer; b saw nothing since hour 3)
    val p4 = Seq(StreamForecast.Ev(t(40 * 3600L), 900001L, "a"))
    val p5 = Seq(StreamForecast.Ev(t(41 * 3600L), 900002L, "a"))
    Seq(p1, p2, p3, p4, p5).zipWithIndex.foreach { case (p, i) =>
      p.toDS().coalesce(1).write.parquet(s"$base/in/p${i + 1}")
      graft.TestSpark.touch(s"$base/in/p${i + 1}", (i + 1) * 1000L)
    }

    graft.TestSpark.withRocksDB {
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[StreamForecast.Ev]].schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(s"$base/in")
        .as[StreamForecast.Ev]
      val q = StreamForecast.scored(stream, lateSec = 60L)
        .writeStream.outputMode("append").format("memory")
        .queryName("streamforecast_out").start()
      try q.processAllAvailable() finally q.stop()
    }

    val rows = spark.table("streamforecast_out")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          if (r.isNullAt(5)) None else Some(r.getLong(5)),
          if (r.isNullAt(6)) None else Some(r.getLong(6))))

    // exactly once per (type, hour)
    assert(rows.length == rows.map(_._1).distinct.length, "duplicate emissions")
    val byKey = rows.toMap
    // final no-data micro-batch advances the watermark to 41h - 60s,
    // sealing through hour 39
    val sealedTo = 39L

    def model(start: Long, counts: Map[Long, Long]): Map[Long, (Long, Option[Long], Option[Long], Option[Long], Option[Long])] =
      (start to sealedTo).map { h =>
        val x = counts.getOrElse(h, 0L)
        def cnt(hh: Long) = counts.getOrElse(hh, 0L)
        val res =
          if (h - start >= 24) {
            val f = (1 to 8).map(k => (1L << (8 - k)) * cnt(h - k)).sum
            (x, Some(f), Some(math.abs(x * 255L - f)),
              Some(math.abs(x - cnt(h - 1))), Some(math.abs(x - cnt(h - 24))))
          } else (x, None, None, None, None)
        h -> res
      }.toMap

    val aCounts = (0L until 28L).map(h => h -> (h % 5)).toMap
    val bCounts = Map(2L -> 1L, 3L -> 1L)
    // hour 0 has h%5 = 0 events, so the series starts at hour 1
    val aModel = model(1L, aCounts)
    val bModel = model(2L, bCounts)
    assert(byKey.keySet == aModel.keys.map(("a", _)).toSet ++ bModel.keys.map(("b", _)).toSet,
      s"complete sealed spans; got ${byKey.keySet.size} rows")
    aModel.foreach { case (h, exp) => assert(byKey(("a", h)) == exp, s"a hour $h") }
    bModel.foreach { case (h, exp) => assert(byKey(("b", h)) == exp, s"b hour $h") }
    // the monitor property: b went silent at hour 3 yet its zero rows
    // kept flowing (timer path) — including post-warm-up forecasts
    assert(byKey(("b", 30L))._1 == 0L && byKey(("b", 30L))._2.isDefined, "silent-type zeros flow")
    // warm-up boundary: first forecast exactly 24 sealed hours in
    assert(byKey(("a", 24L))._2.isEmpty && byKey(("a", 25L))._2.isDefined, "warm-up boundary")
  }
}
