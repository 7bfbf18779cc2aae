package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** Weekly growth accounting, live: rows emitted when the watermark
  * seals a week must equal the batch `events_growth_accounting` rows
  * bit-for-bit — through a >=3-micro-batch stream whose cuts are
  * TIME-ordered (so the watermark advances monotonically, like a real
  * ingest), and across a checkpoint restart that lands MID-WEEK (state
  * for a partially-observed week must survive the restart).
  */
class StreamGrowthSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val WeekSec = 604800L

  /** The fixture plus one synthetic gap user (active, silent a week,
    * active again): the generator's users are active every week after
    * their first, so without it the resurrected/churned legs would be
    * vacuously equal. Both twins run on this augmented dir. */
  private lazy val dir: String = {
    val base = Files.createTempDirectory("sgrowth_fix").toString
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val minSec = graft.ops.Tables.events(spark, "/root/testdata/sf0.001")
      .select(min(col("ts").cast("long"))).head().getLong(0)
    val w0 = minSec / WeekSec
    def synth(sec: Long): DataFrame = {
      val tsCol = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => lit(sec * 1000000000L)
        case _ => timestamp_seconds(lit(sec)).cast(raw.schema("ts").dataType)
      }
      raw.limit(1).withColumn("user_id", lit(9001L)).withColumn("ts", tsCol)
    }
    raw.unionByName(synth(w0 * WeekSec + 1000L))
      .unionByName(synth((w0 + 2) * WeekSec + 1000L))
      .coalesce(1).write.parquet(s"$base/events.parquet")
    base
  }

  private def ev: DataFrame = graft.ops.Tables.events(spark, dir)
    .select(col("user_id"), col("ts").cast("timestamp").as("ts"))

  private def runStream(inDir: String, ckpt: String, out: String): Unit = TestSpark.withRocksDB {
    import spark.implicits._
    val stream = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(inDir)
      .as[StreamGrowth.Ev]
    val q = StreamGrowth.stages(stream)
      .writeStream
      .foreachBatch { (b: Dataset[StreamGrowth.StageRow], id: Long) =>
        // batchId-keyed overwrite = idempotent under at-least-once replay
        StreamGrowth.weeklyOf(b.toDF()).write.mode("overwrite")
          .parquet(s"$out/batch_$id")
      }
      .trigger(Trigger.ProcessingTime(100))
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    q.stop()
  }

  test("sealed weeks equal the batch decomposition bit-for-bit, across a mid-week restart") {
    val base = Files.createTempDirectory("sgrowth").toString
    val secs = ev.select(col("ts").cast("long").as("sec"))
      .agg(min(col("sec")), max(col("sec"))).head()
    val (minSec, maxSec) = (secs.getLong(0), secs.getLong(1))
    val (wMin, wMax) = (minSec / WeekSec, maxSec / WeekSec)
    assert(wMax - wMin >= 3, s"fixture must span >=4 weeks: $wMin..$wMax")
    // time-ordered cuts; the second lands MID-week (the restart point)
    val t1 = (wMin + (wMax - wMin) / 3 + 1) * WeekSec
    val t2 = (wMin + 2 * (wMax - wMin) / 3) * WeekSec + WeekSec / 2
    def slice(pred: org.apache.spark.sql.Column, name: String, mtime: Long): Unit = {
      ev.filter(pred).coalesce(1).write.parquet(s"$base/in/$name")
      TestSpark.touch(s"$base/in/$name", mtime)
    }
    slice(col("ts").cast("long") < t1, "p1", 1000L)
    slice(col("ts").cast("long") >= t1 && col("ts").cast("long") < t2, "p2", 2000L)

    runStream(s"$base/in", s"$base/ckpt", s"$base/out")

    // restart window: the remaining data plus a sentinel event that
    // pushes the watermark just past the seal of wMax (and NOT past
    // wMax+1, matching the batch churn horizon week+1 <= max_week)
    slice(col("ts").cast("long") >= t2, "p3", 3000L)
    import spark.implicits._
    Seq((-99L, new java.sql.Timestamp((wMax + 2) * WeekSec * 1000L)))
      .toDF("user_id", "ts").coalesce(1).write.parquet(s"$base/in/p9")
    TestSpark.touch(s"$base/in/p9", 4000L)

    runStream(s"$base/in", s"$base/ckpt", s"$base/out")

    val streamed = spark.read.parquet(s"$base/out/batch_*")
      .collect().map { r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), if (r.isNullAt(6)) None else Some(r.getDouble(6))))
      }.toMap

    val batch = graft.SparkEntry.queries("events_growth_accounting")(spark, dir)
      .collect().map { r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), if (r.isNullAt(6)) None else Some(r.getDouble(6))))
      }.toMap

    // unified week-set contract (round 15): a weekly row exists for
    // every week with ANY verdict — activity OR churn — on BOTH sides,
    // so the comparison is strict set equality, no exclusions
    assert(streamed.keySet === batch.keySet,
      s"week sets must match: stream-only ${streamed.keySet -- batch.keySet}, " +
        s"batch-only ${batch.keySet -- streamed.keySet}")
    batch.foreach { case (w, row) =>
      assert(streamed(w) === row, s"week $w: streamed ${streamed(w)} vs batch $row")
    }
    // the fixture must exercise every stage class or equality proves little
    assert(batch.values.map(_._2).sum > 0, "no new users")
    assert(batch.values.map(_._3).sum > 0, "no retained users")
    assert(batch.values.map(_._4).sum > 0, "no resurrected users")
    assert(batch.values.map(_._5).sum > 0, "no churned users")
    // and genuinely multiple micro-batches contributed weekly rows
    val batchDirs = new java.io.File(s"$base/out").listFiles()
      .filter(_.getName.startsWith("batch_"))
    assert(batchDirs.length >= 3, s"expected >=3 micro-batches: ${batchDirs.length}")
  }

  test("an all-churned week is a real wau=0 row on BOTH sides (unified week set)") {
    val base = Files.createTempDirectory("sgrowth_churn").toString
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val minSec = graft.ops.Tables.events(spark, "/root/testdata/sf0.001")
      .select(min(col("ts").cast("long"))).head().getLong(0)
    val w0 = minSec / WeekSec
    def synth(uid: Long, week: Long): DataFrame = {
      val sec = week * WeekSec + 1000L
      val tsCol = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => lit(sec * 1000000000L)
        case _ => timestamp_seconds(lit(sec)).cast(raw.schema("ts").dataType)
      }
      raw.limit(1).withColumn("user_id", lit(uid)).withColumn("ts", tsCol)
    }
    // u1: w0, w0+1 (churns at w0+2 — a week NOBODY is active);
    // u2: w0 (churns at w0+1); u3: w0 then resurrects at w0+3 (keeps
    // the horizon open so the all-churned week w0+2 is inside it)
    val evs = synth(1, w0).unionByName(synth(1, w0 + 1))
      .unionByName(synth(2, w0))
      .unionByName(synth(3, w0)).unionByName(synth(3, w0 + 3))
    evs.coalesce(1).write.parquet(s"$base/events.parquet")

    def rows(df: DataFrame) = df.collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), if (r.isNullAt(6)) None else Some(r.getDouble(6))))
    }.toMap
    val batch = rows(graft.SparkEntry.queries("events_growth_accounting")(spark, base))
    assert(batch.contains(w0 + 2), "the all-churned week must be a batch row now")
    assert(batch(w0 + 2)._1 === 0L && batch(w0 + 2)._5 === 1L,
      s"w+2 must read wau=0, n_churned=1: ${batch(w0 + 2)}")

    // stream the same events; a sentinel beyond w0+4 seals w0+3
    graft.ops.Tables.events(spark, base)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
      .coalesce(1).write.parquet(s"$base/in/p1")
    TestSpark.touch(s"$base/in/p1", 1000L)
    import spark.implicits._
    Seq((-99L, new java.sql.Timestamp((w0 + 5) * WeekSec * 1000L)))
      .toDF("user_id", "ts").coalesce(1).write.parquet(s"$base/in/p9")
    TestSpark.touch(s"$base/in/p9", 2000L)
    runStream(s"$base/in", s"$base/ckpt", s"$base/out")
    val streamed = rows(spark.read.parquet(s"$base/out/batch_*"))
    assert(streamed === batch,
      s"unified twins must agree on the full week set: $streamed vs $batch")
  }
}
