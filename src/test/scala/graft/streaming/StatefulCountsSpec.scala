package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark
import StatefulCounts.Event

/** flatMapGroupsWithState keeps per-key running totals across
  * micro-batches via the state store. */
class StatefulCountsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("keyed state accumulates across two micro-batches") {
    import spark.implicits._
    val base = Files.createTempDirectory("stateful").toString
    Seq(Event("a", 1.0), Event("a", 2.0), Event("b", 10.0)).toDS()
      .coalesce(1).write.parquet(s"$base/in/p1")
    Seq(Event("a", 4.0), Event("c", 7.0)).toDS()
      .coalesce(1).write.parquet(s"$base/in/p2")

    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Event]].schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(s"$base/in")
      .as[Event]

    val q = StatefulCounts.runningStats(stream)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("stateful_out")
      .trigger(Trigger.ProcessingTime(100))
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()

    // last emitted row per key reflects the accumulated state
    val last = spark.sql("SELECT key, n, total FROM stateful_out")
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2))))
      .groupBy(_._1).map { case (k, rows) => k -> rows.map(_._2).maxBy(_._1) }
    assert(last === Map(
      "a" -> ((3L, 7.0)),
      "b" -> ((1L, 10.0)),
      "c" -> ((1L, 7.0)),
    ))
  }
}
