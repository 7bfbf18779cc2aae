package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** The on-line CUSUM recursion (integer micro-units, one Long of state
  * per user) must land on exactly the batch query's prefix-min-
  * reflection statistics through a real ts-ordered micro-batched
  * stream — including alerts that fire in a later batch than the drift
  * began.
  */
class StreamCusumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  private def snap(v: Double, s: Int): Double =
    BigDecimal(v).setScale(8, BigDecimal.RoundingMode.HALF_UP)
      .setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("streamed CUSUM reproduces events_cusum_drift exactly across batch cuts") {
    graft.TestSpark.withRocksDB {
    val base = Files.createTempDirectory("scusum").toString
    val ev = graft.ops.Tables.events(spark, dir)
      .select(col("ts"), col("user_id"), col("event_id"), col("value"))

    // three ts-ordered micro-batches (timestamp cuts never split a tie
    // group: event times are distinct at microsecond grain per user)
    val ordered = ev.withColumn("us", unix_micros(col("ts")))
    val Array(t1, t2) = ordered.stat.approxQuantile("us", Array(0.33, 0.66), 0.0)
    ordered.filter(col("us") <= t1).drop("us").coalesce(1).write.parquet(s"$base/in/p1")
    ordered.filter(col("us") > t1 && col("us") <= t2).drop("us").coalesce(1).write.parquet(s"$base/in/p2")
    ordered.filter(col("us") > t2).drop("us").coalesce(1).write.parquet(s"$base/in/p3")
    TestSpark.touch(s"$base/in/p1", 1000L)
    TestSpark.touch(s"$base/in/p2", 2000L)
    TestSpark.touch(s"$base/in/p3", 3000L)

    // the baseline a deployment would profile offline — the batch
    // query's own output carries (user_id, mu, sigma)
    val batch = graft.SparkEntry.queries("events_cusum_drift")(spark, dir)
    val baseline = batch.select(col("user_id"), col("mu"), col("sigma"))

    val rowsOut = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Double, Boolean)]()
    implicit val evEnc = org.apache.spark.sql.Encoders.product[StreamCusum.Ev]
    val q = StreamCusum.scored(
        spark.readStream
          .schema(ev.schema)
          .option("maxFilesPerTrigger", "1")
          .option("recursiveFileLookup", "true")
          .parquet(s"$base/in")
          .as[StreamCusum.Ev],
        baseline)
      .toDF()
      .writeStream
      .outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.collect().foreach { r =>
          rowsOut += ((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
        }
        ()
      }
      .trigger(Trigger.ProcessingTime(100))
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()

    // every event scored exactly once
    val nEvents = ev.count()
    assert(rowsOut.size.toLong == nEvents, s"${rowsOut.size} scored vs $nEvents events")

    // fold the streamed per-event stats to the batch summary shape
    val streamed = rowsOut.groupBy(_._1).map { case (u, rs) =>
      val alerts = rs.filter(_._5)
      u -> ((rs.size.toLong, snap(rs.map(_._4).max, 4),
        alerts.size.toLong, if (alerts.isEmpty) -1L else alerts.map(_._3).min))
    }
    val expected = batch.collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getDouble(4), r.getLong(5), r.getLong(6)))
    }.toMap
    assert(streamed.keySet == expected.keySet)
    // max_stat in the batch query is max over the whole series; the
    // streamed max over all emitted stats is the same quantity
    streamed.foreach { case (u, got) =>
      assert(got == expected(u), s"user $u streamed $got vs batch ${expected(u)}")
    }

    // the cut must be non-trivial: some user's FIRST alert fires after
    // the first batch boundary (state carried the partial sum across)
    val firstAlerts = expected.collect { case (u, (_, _, n, first)) if n > 0 => (u, first) }
    assert(firstAlerts.nonEmpty, "fixture must produce alerts")
    assert(firstAlerts.exists { case (_, sec) => sec * 1000000L > t1.toLong },
      "some first alert must land beyond the first micro-batch cut")
    }
  }

  test("micro-unit snap matches the batch DECIMAL(18,6) cast on negative half-way values") {
    // DECIMAL casts round HALF_UP (away from zero); math.round rounds
    // half toward +inf — they disagree exactly on negative values with
    // more than 6 decimal places
    assert(StreamCusum.micro(-0.0000005) === -1L)
    assert(math.round(-0.0000005 * 1e6) === 0L, "guard: the old form really differed")
    assert(StreamCusum.micro(0.0000005) === 1L)
    assert(StreamCusum.micro(-2.3456785) === -2345679L)
    assert(StreamCusum.micro(1.25) === 1250000L)
    // and bit-agreement with Spark's own double -> DECIMAL(18,6) cast
    // over a sign-mixed sample, the batch twin's exact arithmetic
    val vals = Seq(-3.14159265, -0.0000015, -0.1234565, 0.0, 0.9999995, 7.5e-7)
    val viaSpark = {
      val s2 = spark; import s2.implicits._
      vals.toDF("v")
        .select((col("v").cast("decimal(18,6)") * 1000000L).cast("long"))
        .collect().map(_.getLong(0)).toSeq
    }
    assert(vals.map(StreamCusum.micro) === viaSpark)
  }
}
