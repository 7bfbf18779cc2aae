package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

final case class StreamDoc(ts: Timestamp, doc_id: Long, text: String)

/** Watermark-bounded streaming exact-dedup: duplicates arriving within
  * the horizon collapse across micro-batches; state never outgrows the
  * horizon. */
class StreamDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  test("content duplicates within the horizon collapse across micro-batches") {
    import spark.implicits._
    val base = Files.createTempDirectory("sdedup").toString
    // batch 1: two distinct docs
    Seq(StreamDoc(t(100), 1L, "the quick brown fox"), StreamDoc(t(101), 2L, "entirely different text"))
      .toDS().coalesce(1).write.parquet(s"$base/in/p1")
    // batch 2: a content-duplicate of doc 1 (different id), plus a new doc
    Seq(StreamDoc(t(102), 3L, "the quick brown fox"), StreamDoc(t(103), 4L, "a third document"))
      .toDS().coalesce(1).write.parquet(s"$base/in/p2")
    // FileStreamSource orders by modification time; pin it so p1 is
    // always the first micro-batch (equal mtimes would flip which
    // duplicate survives)
    graft.TestSpark.touch(s"$base/in/p1", 1000L)
    graft.TestSpark.touch(s"$base/in/p2", 2000L)

    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[StreamDoc]].schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(s"$base/in")

    val q = StreamDedup.dedupedByContent(stream, horizon = "10 minutes")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sdedup_out")
      .trigger(Trigger.ProcessingTime(100))
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()

    val ids = spark.sql("SELECT doc_id FROM sdedup_out")
      .collect().map(_.getLong(0)).sorted.toSeq
    // doc 3 (same content as doc 1, within the horizon) is dropped
    assert(ids === Seq(1L, 2L, 4L))
  }
}
