package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** Watermark-bounded streaming NEAR-dedup: near-duplicates (small
  * SimHash Hamming distance) arriving within the horizon collapse onto
  * the earliest canonical across micro-batches; entries past the
  * horizon are evicted so the same content becomes canonical again. */
class StreamNearDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  private val textA = "the quick brown fox jumps over the lazy dog while autumn " +
    "leaves drift slowly across the quiet meadow under a pale morning sky as " +
    "birds circle high above the distant hills"
  // one word changed: same 16-bit prefix bucket, Hamming 1 (asserted below)
  private val textA2 = textA.replace("autumn", "winter")
  private val textB = "completely unrelated content about database engines and " +
    "distributed query planning with adaptive execution and columnar storage"
  private val textC = "yet another independent document concerning maritime " +
    "navigation and the history of celestial wayfinding across open oceans"
  private val textD = "late era filler document that only exists to push the " +
    "event time watermark far past every earlier arrival in the stream"

  /** Batch-side fingerprint of (doc_id, text) pairs via the SAME SQL
    * vote aggregation as `DedupQueries.fingerprints` — the reference
    * both parity tests compare simhash60 against. */
  private def sqlFingerprints(texts: Seq[(Long, String)]): Map[Long, Long] = {
    import spark.implicits._
    val voteAggs = (0 until 60).map { i =>
      org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.expr(
        s"CASE WHEN (hl div ${1L << i}L) % 2 = 1 THEN 1 ELSE -1 END")).as(s"s$i")
    }
    val assemble = (0 until 60).map(i => s"if(s$i > 0, ${1L << i}L, 0L)").mkString(" + ")
    texts.toDF("doc_id", "text")
      .selectExpr("doc_id", "explode(split(text, ' ')) AS w")
      .selectExpr("doc_id", "cast(conv(substring(md5(w), 1, 15), 16, 10) AS bigint) AS hl")
      .groupBy("doc_id").agg(voteAggs.head, voteAggs.tail: _*)
      .selectExpr("doc_id", s"$assemble AS simhash")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("simhash60 is bit-identical to the batch SQL fingerprint") {
    // doc 6 pins trailing-whitespace parity: Spark SQL's split keeps the
    // trailing empty string (md5("") votes), so simhash60 must too
    val texts = Seq(1L -> textA, 2L -> textA2, 3L -> textB, 4L -> "solo",
      5L -> "repeat repeat repeat distinct", 6L -> "trailing space ")
    val sqlFps = sqlFingerprints(texts)
    texts.foreach { case (id, txt) =>
      assert(StreamNearDedup.simhash60(txt) === sqlFps(id), s"doc $id")
    }
  }

  test("simhash60 matches the batch SQL fingerprint on random texts (property)") {
    val rnd = new scala.util.Random(42)
    // alphabet biased toward collisions and edge shapes: repeated words,
    // single chars, multi-space runs (empty words), trailing spaces
    val words = Vector("a", "b", "ab", "the", "quick", "zz9", "", "x")
    val texts = (0 until 40).map { i =>
      (i.toLong, (0 until (1 + rnd.nextInt(12))).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    }
    val sqlFps = sqlFingerprints(texts)
    texts.foreach { case (id, txt) =>
      assert(StreamNearDedup.simhash60(txt) === sqlFps(id),
        s"doc $id text=${txt.map(c => if (c == ' ') '_' else c)}")
    }
  }

  test("fixture pair shares the LSH bucket at small Hamming distance") {
    val fa = StreamNearDedup.simhash60(textA)
    val fb = StreamNearDedup.simhash60(textA2)
    assert(StreamNearDedup.prefix16(fa) === StreamNearDedup.prefix16(fb))
    val ham = java.lang.Long.bitCount(fa ^ fb)
    assert(ham > 0 && ham <= 12, s"hamming $ham")
  }

  test("near-dups collapse within the horizon and re-canonicalize after it") {
    import spark.implicits._
    val base = Files.createTempDirectory("sneardedup").toString
    // batch 1: canonical A + unrelated B
    Seq(StreamNearDedup.Doc(t(100), 1L, textA), StreamNearDedup.Doc(t(101), 2L, textB))
      .toDS().coalesce(1).write.parquet(s"$base/in/p1")
    // batch 2: near-dup of A (one word changed, different id) + new C
    Seq(StreamNearDedup.Doc(t(150), 3L, textA2), StreamNearDedup.Doc(t(160), 4L, textC))
      .toDS().coalesce(1).write.parquet(s"$base/in/p2")
    // batch 3: far-future doc pushes the watermark past t(100)+horizon
    Seq(StreamNearDedup.Doc(t(10000), 5L, textD))
      .toDS().coalesce(1).write.parquet(s"$base/in/p3")
    // batch 4: textA again, outside the horizon of doc 1 -> canonical
    Seq(StreamNearDedup.Doc(t(10050), 6L, textA))
      .toDS().coalesce(1).write.parquet(s"$base/in/p4")
    // FileStreamSource orders by modification time; pin batch order
    graft.TestSpark.touch(s"$base/in/p1", 1000L)
    graft.TestSpark.touch(s"$base/in/p2", 2000L)
    graft.TestSpark.touch(s"$base/in/p3", 3000L)
    graft.TestSpark.touch(s"$base/in/p4", 4000L)

    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[StreamNearDedup.Doc]].schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(s"$base/in")
      .as[StreamNearDedup.Doc]

    val q = StreamNearDedup.decisions(stream, horizonSec = 600L)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sneardedup_out")
      .trigger(Trigger.ProcessingTime(100))
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()

    val rows = spark.sql("SELECT doc_id, is_dup, dup_of FROM sneardedup_out")
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(rows.size === 6, "every arrival gets a decision row")
    assert(rows(1L) === ((false, 1L)), "first arrival is canonical")
    assert(rows(2L) === ((false, 2L)))
    assert(rows(3L) === ((true, 1L)), "near-dup within horizon collapses onto doc 1")
    assert(rows(4L) === ((false, 4L)))
    assert(rows(5L) === ((false, 5L)))
    assert(rows(6L) === ((false, 6L)), "same text past the horizon re-canonicalizes")
  }
}
