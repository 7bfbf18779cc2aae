package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** transformWithState running profiles: named value state accumulates
  * across micro-batches on the RocksDB store; each touched key emits
  * its updated profile per batch. */
class RunningProfileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("per-user counts and totals accumulate across micro-batches") {
    import spark.implicits._
    val base = Files.createTempDirectory("rprof").toString
    Seq(ProfileEvent(1L, 2.0), ProfileEvent(2L, 5.0), ProfileEvent(1L, 3.0))
      .toDS().coalesce(1).write.parquet(s"$base/in/p1")
    Seq(ProfileEvent(1L, 10.0), ProfileEvent(3L, 7.0))
      .toDS().coalesce(1).write.parquet(s"$base/in/p2")
    graft.TestSpark.touch(s"$base/in/p1", 1000L)
    graft.TestSpark.touch(s"$base/in/p2", 2000L)

    graft.TestSpark.withRocksDB {
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[ProfileEvent]].schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(s"$base/in")
        .as[ProfileEvent]

      val q = RunningProfile.profiles(stream)
        .writeStream
        .outputMode("update")
        .format("memory")
        .queryName("rprof_out")
        .trigger(Trigger.ProcessingTime(100))
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      q.processAllAvailable()
      q.stop()

      // latest emission per user = accumulated profile
      val last = spark.sql(
        """SELECT user_id, n_events, total FROM (
          |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
          |  FROM rprof_out) WHERE rn = 1""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(last === Set((1L, 3L, 15.0), (2L, 1L, 5.0), (3L, 1L, 7.0)))
    }
  }
}
