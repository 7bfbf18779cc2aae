package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** Live centroid-drift monitor: stream-end per-label drift over the
  * "new snapshot" half must equal the batch sim_centroid_drift rows
  * bit-for-bit — including across a checkpoint restart, so the
  * integer-exact running sums genuinely carry.
  */
class StreamCentroidDriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  private def oddVecs = graft.ops.Tables.table(spark, dir, "embeddings")
    .filter(pmod(col("vec_id"), lit(2)) === 1)
    .select(col("vec_id"), col("label"), col("embedding"))

  test("stream-end drift equals the batch query bit-for-bit across cuts and a restart") {
    import spark.implicits._
    val base = Files.createTempDirectory("scdrift").toString
    val ref = StreamCentroidDrift.referenceFrom(spark, dir)
    assert(ref.nonEmpty && ref.forall(_._2.length == 64))

    def runUntilDrained(): Map[Int, (Long, Double)] = {
      val latest = scala.collection.mutable.Map[Int, (Long, Double)]()
      val q = StreamCentroidDrift.monitored(
          spark.readStream
            .schema(implicitly[org.apache.spark.sql.Encoder[StreamCentroidDrift.Vec]].schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(s"$base/in")
            .as[StreamCentroidDrift.Vec],
          ref)
        .toDF()
        .writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => latest(r.getInt(0)) = (r.getLong(1), r.getDouble(2)))
          ()
        }
        .trigger(Trigger.ProcessingTime(100))
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      q.processAllAvailable(); q.stop()
      latest.toMap
    }

    TestSpark.withRocksDB {
      // vec_id ranges: every label spans both sides of the restart
      oddVecs.filter(col("vec_id") < 250).coalesce(1).write.parquet(s"$base/in/p1")
      TestSpark.touch(s"$base/in/p1", 1000L)
      val run1 = runUntilDrained()
      oddVecs.filter(col("vec_id") >= 250).coalesce(1).write.parquet(s"$base/in/p2")
      TestSpark.touch(s"$base/in/p2", 2000L)
      val run2 = runUntilDrained()

      val batch = graft.SparkEntry.queries("sim_centroid_drift")(spark, dir)
        .collect().map(r => r.getInt(0) -> ((r.getLong(2), r.getDouble(3)))).toMap

      assert(run2.keySet === batch.keySet)
      batch.foreach { case (label, (nOdd, drift)) =>
        assert(run2(label)._1 === nOdd, s"label $label n")
        assert(run2(label)._2 === drift,
          s"label $label drift: streamed ${run2(label)._2} vs batch $drift")
        assert(run1(label)._1 < nOdd,
          s"label $label: run 1 must be partial or the restart proves nothing")
      }
    }
  }

  test("unit8/meanOf reproduce the batch decimal arithmetic on adversarial values") {
    import StreamCentroidDrift._
    // float's widened double reprs snap like the batch DECIMAL(18,8) cast
    assert(unit8(0.1f.toDouble) === 10000000L)
    assert(unit8(-0.000000005) === -1L, "HALF_UP away from zero on the 8th dp")
    val sums = Array(unit8(0.1f.toDouble), unit8(0.3f.toDouble))
    val mean = meanOf(sums.zip(sums).map(p => p._1 + p._2), 2)
    assert(mean === Array(0.1, 0.3), "mean of two equal values is the value")
  }
}
