package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

final case class EnrichEvent(ts: Timestamp, user_id: Long, action: String)
final case class UserDim(user_id: Long, segment: String)

/** Stream-static enrichment: stateless per-batch broadcast join, left
  * semantics keep events whose dimension row is missing. */
class StreamEnrichSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  test("events enrich against the static dim; unknown users survive with null segment") {
    import spark.implicits._
    val base = Files.createTempDirectory("senrich").toString
    Seq(EnrichEvent(t(100), 1L, "click"), EnrichEvent(t(101), 2L, "view"))
      .toDS().coalesce(1).write.parquet(s"$base/in/p1")
    Seq(EnrichEvent(t(102), 1L, "purchase"), EnrichEvent(t(103), 99L, "click"))
      .toDS().coalesce(1).write.parquet(s"$base/in/p2")

    val dim = Seq(UserDim(1L, "power"), UserDim(2L, "casual"), UserDim(3L, "dormant")).toDF()

    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[EnrichEvent]].schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(s"$base/in")

    val q = StreamEnrich.enriched(stream, dim, "user_id")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("senrich_out")
      .trigger(Trigger.ProcessingTime(100))
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    q.processAllAvailable()
    // stateless: a stream-static join must not create a state operator
    val progress = q.lastProgress
    q.stop()
    assert(progress == null || progress.stateOperators.isEmpty,
      "stream-static join must be stateless")

    val rows = spark.sql("SELECT user_id, action, segment FROM senrich_out")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(rows === Set(
      (1L, "click", Some("power")),
      (1L, "purchase", Some("power")),
      (2L, "view", Some("casual")),
      (99L, "click", None)))
  }
}
