package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** The in-flight quota must admit exactly the documents the batch
  * first-cap admits (rank by arrival = doc_id), regardless of how the
  * stream is micro-batched — including a source whose quota fills
  * ACROSS batch boundaries, where a per-batch window can't see the
  * running count. */
class StreamSourceCapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"
  val Cap = 7

  test("property: any doc_id-ordered batch split admits exactly the batch first-cap") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 6) {
      val n = 80 + rnd.nextInt(120)
      val cap = 1 + rnd.nextInt(6)
      val docs = (0 until n).map(i =>
        StreamSourceCap.Doc(i.toLong, s"s${rnd.nextInt(6)}"))
      // model: first `cap` per source by doc_id
      val model = docs.groupBy(_.source).flatMap { case (_, ds) =>
        ds.sortBy(_.doc_id).take(cap)
      }.map(d => (d.doc_id, d.source)).toSet
      // random positional cuts over the doc_id-ordered sequence
      val cuts = (Seq.fill(rnd.nextInt(5))(rnd.nextInt(n + 1)).sorted :+ n).distinct
      val state = scala.collection.mutable.Map[String, Long]()
      val admitted = scala.collection.mutable.Set[(Long, String)]()
      (0 +: cuts).sliding(2).foreach {
        case Seq(a, b) =>
          docs.slice(a, b).groupBy(_.source).foreach { case (src, ds) =>
            val gs = new TestGroupState[Long](state.get(src))
            StreamSourceCap.admit(cap)(src, ds.iterator, gs)
              .foreach(d => admitted += ((d.doc_id, d.source)))
            gs.getOption.foreach(state(src) = _)
          }
        case _ => ()
      }
      assert(admitted.toSet === model, s"trial $trial (cap=$cap cuts=$cuts)")
    }
  }

  test("streamed admission equals the batch first-cap across micro-batch boundaries") {
    val base = Files.createTempDirectory("scap").toString
    val docs = graft.ops.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
    // three doc_id-ordered micro-batches: quotas fill mid-stream
    val Array(c1, c2) = docs.stat.approxQuantile("doc_id", Array(0.33, 0.66), 0.0)
    docs.filter(col("doc_id") <= c1).coalesce(1).write.parquet(s"$base/in/p1")
    docs.filter(col("doc_id") > c1 && col("doc_id") <= c2).coalesce(1).write.parquet(s"$base/in/p2")
    docs.filter(col("doc_id") > c2).coalesce(1).write.parquet(s"$base/in/p3")
    TestSpark.touch(s"$base/in/p1", 1000L)
    TestSpark.touch(s"$base/in/p2", 2000L)
    TestSpark.touch(s"$base/in/p3", 3000L)

    val admitted = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val q = StreamSourceCap.admitted(
        spark.readStream
          .schema(docs.schema)
          .option("maxFilesPerTrigger", "1")
          .option("recursiveFileLookup", "true")
          .parquet(s"$base/in"),
        Cap)
      .toDF()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        admitted ++= b.collect().map(r => (r.getLong(0), r.getString(1)))
        ()
      }
      .trigger(Trigger.ProcessingTime(100))
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()

    val expected = docs
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("doc_id"))))
      .filter(col("rank") <= Cap)
      .select(col("doc_id"), col("source"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(admitted.size === admitted.toSet.size, "no document admitted twice")
    assert(admitted.toSet === expected,
      s"stream admitted ${admitted.size}, batch first-cap has ${expected.size}")
    // the cap actually bit: some source exceeded it in the fixture
    val total = docs.count()
    assert(admitted.size < total, "fixture must overflow at least one source's quota")
  }
}
