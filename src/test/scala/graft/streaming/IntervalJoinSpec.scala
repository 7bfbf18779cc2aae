package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

final case class ViewEv(user: String, view_ts: Timestamp, page: String)
final case class ClickEv(user: String, click_ts: Timestamp, target: String)

/** Stream-stream interval join: clicks attribute to a view by the same
  * user within the horizon; pairs outside it never join. */
class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def t(sec: Long) = new Timestamp(sec * 1000L)

  test("clicks join views of the same user within the horizon only") {
    import spark.implicits._
    val base = Files.createTempDirectory("ssjoin").toString
    Seq(
      ViewEv("u1", t(100), "home"),
      ViewEv("u2", t(100), "search"),
      ViewEv("u3", t(100), "home"),
      ViewEv("u5", t(200), "promo"),
    ).toDS().coalesce(1).write.parquet(s"$base/views/p1")
    Seq(
      ClickEv("u1", t(160), "ad1"),  // 60 s after the view: joins
      ClickEv("u2", t(1000), "ad2"), // 900 s after: outside horizon
      ClickEv("u4", t(160), "ad3"),  // no view at all
      ClickEv("u5", t(150), "ad4"),  // BEFORE u5's view: lower bound rejects
    ).toDS().coalesce(1).write.parquet(s"$base/clicks/p1")

    def stream[A: org.apache.spark.sql.Encoder](dir: String) = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[A]].schema)
      .option("recursiveFileLookup", "true").parquet(dir)

    val joined = IntervalJoin.joinWithin(
      stream[ViewEv](s"$base/views"), stream[ClickEv](s"$base/clicks"),
      key = "user", leftTs = "view_ts", rightTs = "click_ts", horizon = "5 minutes")

    val q = joined.writeStream
      .outputMode("append").format("memory").queryName("ssjoin_out")
      .trigger(Trigger.ProcessingTime(100))
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    q.processAllAvailable(); q.stop()

    val rows = spark.sql("SELECT user, page, target FROM ssjoin_out")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows === Set(("u1", "home", "ad1")))
  }

  test("left-outer variant emits unmatched views with nulls once the watermark passes") {
    import spark.implicits._
    val base = Files.createTempDirectory("ssjoin_lo").toString
    Seq(
      ViewEv("u1", t(100), "home"),   // matched by ad1
      ViewEv("u3", t(100), "promo"),  // never matched -> null row
    ).toDS().coalesce(1).write.parquet(s"$base/views/p1")
    Seq(
      ClickEv("u1", t(160), "ad1"),
    ).toDS().coalesce(1).write.parquet(s"$base/clicks/p1")

    def stream[A: org.apache.spark.sql.Encoder](dir: String) = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[A]].schema)
      .option("recursiveFileLookup", "true").parquet(dir)

    val joined = IntervalJoin.joinWithinLeftOuter(
      stream[ViewEv](s"$base/views"), stream[ClickEv](s"$base/clicks"),
      key = "user", leftTs = "view_ts", rightTs = "click_ts",
      horizon = "5 minutes", lateness = Some("10 seconds"))

    val q = joined.writeStream
      .outputMode("append").format("memory").queryName("ssjoin_lo_out")
      .trigger(Trigger.ProcessingTime(100))
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    q.processAllAvailable()

    // Advance both watermarks far past view_ts + horizon + lateness so
    // the unmatched u3 view provably cannot match anymore; the null row
    // lands in the micro-batch AFTER the watermark update, so flush
    // twice.
    Seq(ViewEv("flush", t(10000), "x")).toDS().coalesce(1).write.parquet(s"$base/views/p2")
    Seq(ClickEv("flush", t(10000), "x")).toDS().coalesce(1).write.parquet(s"$base/clicks/p2")
    q.processAllAvailable()
    Seq(ViewEv("flush2", t(20000), "x")).toDS().coalesce(1).write.parquet(s"$base/views/p3")
    Seq(ClickEv("flush2", t(20000), "x")).toDS().coalesce(1).write.parquet(s"$base/clicks/p3")
    q.processAllAvailable(); q.stop()

    val rows = spark.sql("SELECT user, page, target FROM ssjoin_lo_out WHERE user IN ('u1','u3')")
      .collect().map(r => (r.getString(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(rows === Set(
      ("u1", "home", Some("ad1")),
      ("u3", "promo", None)))
  }
}
