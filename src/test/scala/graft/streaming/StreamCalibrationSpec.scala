package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** Online calibration monitor: stream-end per-bin stats must equal the
  * batch eval_calibration_bins output on the same corpus (the
  * offline/online equivalence every monitoring twin here pins), and an
  * injected label shift must raise the drift flag.
  */
class StreamCalibrationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  private def docsDf = graft.ops.Tables.table(spark, dir, "documents")
    .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))

  test("stream-end bins equal the batch calibration table on the same corpus") {
    import spark.implicits._
    val base = Files.createTempDirectory("scalib").toString
    // the harness corpus split into two micro-batches by doc_id parity
    docsDf.filter(col("doc_id") % 2 === 0)
      .coalesce(1).write.parquet(s"$base/in/p1")
    docsDf.filter(col("doc_id") % 2 === 1)
      .coalesce(1).write.parquet(s"$base/in/p2")
    TestSpark.touch(s"$base/in/p1", 1000L)
    TestSpark.touch(s"$base/in/p2", 2000L)

    TestSpark.withRocksDB {
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[StreamCalibration.Doc]].schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(s"$base/in")
        .as[StreamCalibration.Doc]
      val q = StreamCalibration.monitored(stream)
        .writeStream.outputMode("append").format("memory")
        .queryName("scalib_out")
        .trigger(Trigger.ProcessingTime(100))
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      q.processAllAvailable()
      q.stop()
    }

    // last emission per bin = stream-end running table
    val streamed = spark.sql(
      "SELECT bin, n, mean_p, frac_pos, gap FROM scalib_out")
      .collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).maxBy(_._1)).toMap

    val batch = graft.SparkEntry.queries("eval_calibration_bins")(spark, dir)
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap

    assert(streamed.keySet == batch.keySet,
      s"bins differ: ${streamed.keySet} vs ${batch.keySet}")
    batch.foreach { case (bin, (n, meanP, fracPos, gap)) =>
      val (sn, sMeanP, sFracPos, sGap) = streamed(bin)
      assert(sn == n, s"bin $bin n $sn != $n")
      assert(math.abs(sMeanP - meanP) < 2e-6, s"bin $bin mean_p")
      assert(math.abs(sFracPos - fracPos) < 2e-6, s"bin $bin frac_pos")
      assert(math.abs(sGap - gap) < 4e-6, s"bin $bin gap")
    }
  }

  test("an injected label shift raises the drift flag on the affected bins") {
    import spark.implicits._
    val base = Files.createTempDirectory("scalib2").toString
    // phase 1: the real corpus (model roughly calibrated on it)
    docsDf.coalesce(1).write.parquet(s"$base/in/p1")
    // phase 2: the same documents with sources renamed OUT of the seed
    // set — predictions unchanged, labels all 0 → frac_pos collapses,
    // gap = mean_p, well past the cut on populated bins
    docsDf.withColumn("source", concat(lit("shifted_"), col("source")))
      .coalesce(1).write.parquet(s"$base/in/p2")
    TestSpark.touch(s"$base/in/p1", 1000L)
    TestSpark.touch(s"$base/in/p2", 2000L)

    TestSpark.withRocksDB {
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[StreamCalibration.Doc]].schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(s"$base/in")
        .as[StreamCalibration.Doc]
      val q = StreamCalibration.monitored(stream, minN = 30L, gapCut = 0.15)
        .writeStream.outputMode("append").format("memory")
        .queryName("scalib2_out")
        .trigger(Trigger.ProcessingTime(100))
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      q.processAllAvailable()
      q.stop()
    }

    val rows = spark.sql("SELECT bin, n, gap, drifted FROM scalib2_out")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val byBin = rows.groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
    val populated = byBin.values.filter(_._2 >= 60)
    assert(populated.nonEmpty, "need at least one well-populated bin")
    // after the shift, every well-populated bin's gap is positive and
    // large (labels halved toward 0 while predictions stood still)
    populated.foreach { case (bin, _, gap, _) =>
      assert(gap > 0.0, s"bin $bin gap $gap")
    }
    assert(populated.exists(_._4), "the shift must raise the drift flag somewhere")
    // the shift moved every populated bin's gap UP vs its phase-1
    // reading (labels collapsed toward 0 while predictions stood still)
    val phase1 = rows.groupBy(_._1).view.mapValues(_.minBy(_._2)).toMap
    populated.foreach { case (bin, n2, gap2, _) =>
      val (_, n1, gap1, _) = phase1(bin)
      if (n1 < n2) // bins touched in both phases
        assert(gap2 > gap1, s"bin $bin gap $gap1 -> $gap2 must increase after the shift")
    }
  }
}
