package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** Live PSI monitor: sealed-horizon emissions must equal the batch
  * eval_psi_drift rows bit-for-bit on the same corpus, through a real
  * multi-micro-batch stream (the offline/online equivalence every
  * monitoring twin here pins).
  */
class StreamPsiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  private def docsDf = graft.ops.Tables.table(spark, dir, "documents")
    .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))

  test("stream-end per-source PSI equals the batch query bit-for-bit") {
    import spark.implicits._
    val base = Files.createTempDirectory("spsi").toString
    // three micro-batches by doc_id residue — every source spans cuts
    docsDf.filter(col("doc_id") % 3 === 0).coalesce(1).write.parquet(s"$base/in/p1")
    docsDf.filter(col("doc_id") % 3 === 1).coalesce(1).write.parquet(s"$base/in/p2")
    docsDf.filter(col("doc_id") % 3 === 2).coalesce(1).write.parquet(s"$base/in/p3")
    TestSpark.touch(s"$base/in/p1", 1000L)
    TestSpark.touch(s"$base/in/p2", 2000L)
    TestSpark.touch(s"$base/in/p3", 3000L)

    // the trusted pool profiled offline — the batch query's reference
    val ref = StreamPsi.referenceFrom(spark, dir)
    assert(ref.map(_.refn).sum === ref.head.ref_total)

    TestSpark.withRocksDB {
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[StreamPsi.Doc]].schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(s"$base/in")
        .as[StreamPsi.Doc]
      val q = StreamPsi.monitored(stream, ref)
        .writeStream.outputMode("append").format("memory")
        .queryName("spsi_out")
        .trigger(Trigger.ProcessingTime(100))
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      q.processAllAvailable()
      q.stop()
    }

    // stream-end = the emission with the largest n_docs per source
    val streamed = spark.sql("SELECT source, n_docs, psi, drift FROM spsi_out")
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getString(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).maxBy(_._1)).toMap

    val batch = graft.SparkEntry.queries("eval_psi_drift")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getString(3))))
      .toMap

    assert(streamed.keySet === batch.keySet)
    batch.foreach { case (src, (n, psi, drift)) =>
      val (sn, sPsi, sDrift) = streamed(src)
      assert(sn === n, s"source $src n_docs")
      assert(sPsi === psi, s"source $src psi: streamed $sPsi vs batch $psi")
      assert(sDrift === drift, s"source $src drift label")
    }
    // the fixture must exercise more than one drift class or the
    // equality above proves little
    assert(batch.values.map(_._3).toSet.size >= 2,
      s"fixture drift labels all identical: ${batch.values.map(_._3).toSet}")
    // and every emission along the way carried a sane running PSI
    assert(spark.sql("SELECT count(*) FROM spsi_out").head.getLong(0) >=
      batch.size * 2L, "sources must emit across multiple micro-batches")
  }

  test("bin state survives a checkpoint restart: resumed counts continue, not restart") {
    import spark.implicits._
    val base = Files.createTempDirectory("spsi_restart").toString
    val ref = StreamPsi.referenceFrom(spark, dir)

    def runUntilDrained(qn: String): Map[String, (Long, Double)] = {
      val latest = scala.collection.mutable.Map[String, (Long, Double)]()
      val q = StreamPsi.monitored(
          spark.readStream
            .schema(implicitly[org.apache.spark.sql.Encoder[StreamPsi.Doc]].schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(s"$base/in")
            .as[StreamPsi.Doc],
          ref)
        .toDF()
        .writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => latest(r.getString(0)) = (r.getLong(1), r.getDouble(2)))
          ()
        }
        .trigger(Trigger.ProcessingTime(100))
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      q.processAllAvailable(); q.stop()
      latest.toMap
    }

    TestSpark.withRocksDB {
      // range split: every source (doc_id-keyed round-robin) appears in
      // BOTH halves, so each source's state genuinely crosses the restart
      docsDf.filter(col("doc_id") < 250).coalesce(1).write.parquet(s"$base/in/p1")
      TestSpark.touch(s"$base/in/p1", 1000L)
      val run1 = runUntilDrained("spsi_r1")
      // stop the JVM-side query entirely, then deliver the rest: the
      // resumed run must CONTINUE the persisted bin counts
      docsDf.filter(col("doc_id") >= 250).coalesce(1).write.parquet(s"$base/in/p2")
      TestSpark.touch(s"$base/in/p2", 2000L)
      val run2 = runUntilDrained("spsi_r2")

      val batch = graft.SparkEntry.queries("eval_psi_drift")(spark, dir)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(run2.keySet === batch.keySet)
      batch.foreach { case (src, (n, psi)) =>
        assert(run2(src)._1 === n,
          s"source $src: post-restart n_docs must be the FULL corpus count")
        assert(run2(src)._2 === psi, s"source $src: sealed-horizon PSI across the restart")
        assert(run1(src)._1 < n,
          s"source $src: run 1 must be partial or the restart proves nothing")
      }
    }
  }

  test("psiOf: identical histogram scores 0/stable, disjoint mass scores major") {
    val ref = Array(0.5, 0.5, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val same = Array(50L, 50L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
    assert(StreamPsi.psiOf(same, ref) === 0.0)
    assert(StreamPsi.driftOf(StreamPsi.psiOf(same, ref)) === "stable")
    val moved = Array(0L, 0L, 50L, 50L, 0L, 0L, 0L, 0L, 0L, 0L)
    val psi = StreamPsi.psiOf(moved, ref)
    assert(psi > 0.2, s"fully-moved mass must flag major drift, got $psi")
    assert(StreamPsi.driftOf(psi) === "major")
  }
}
