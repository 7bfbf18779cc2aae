package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark
import StreamTopK.{Item, ShardState, Slot}

/** SpaceSaving heavy hitters in keyed streaming state: exact equality
  * with the batch GROUP BY in the over-capacity regime (the pin against
  * `agg_approx_topk`'s exact-below-capacity contract), and the
  * textbook overestimate/guarantee invariants when slots are scarce.
  */
class StreamTopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("over-capacity regime: streamed summaries equal the batch GROUP BY exactly") {
    import spark.implicits._
    val base = Files.createTempDirectory("stopk").toString
    val ev = graft.ops.Tables.events(spark, dir)
      .select(col("event_type").as("item"), col("event_id"))

    // three micro-batches cut on event_id (arbitrary but disjoint)
    ev.filter(col("event_id") % 3 === 0).drop("event_id").coalesce(1)
      .write.parquet(s"$base/in/p1")
    ev.filter(col("event_id") % 3 === 1).drop("event_id").coalesce(1)
      .write.parquet(s"$base/in/p2")
    ev.filter(col("event_id") % 3 === 2).drop("event_id").coalesce(1)
      .write.parquet(s"$base/in/p3")
    TestSpark.touch(s"$base/in/p1", 1000L)
    TestSpark.touch(s"$base/in/p2", 2000L)
    TestSpark.touch(s"$base/in/p3", 3000L)

    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Item]].schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(s"$base/in")
      .as[Item]

    val q = StreamTopK.summaries(stream, nShards = 4, capacity = 16)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("stopk_exact")
      .trigger(Trigger.ProcessingTime(100))
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()

    // nothing evicts over capacity, so est is monotone per item and the
    // final summary row is the max-est emission
    val streamed = spark.sql("SELECT item, est, err FROM stopk_exact")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (k, rows) => k -> rows.map(_._2).max }
    val exact = ev.groupBy(col("item")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === exact) // every type tracked, every count exact
    // and exactness means zero recorded error
    assert(spark.sql("SELECT max(err) FROM stopk_exact").head().getLong(0) === 0L)
  }

  test("absorb: bounded slots, overestimate bound, heavy-hitter guarantee") {
    val capacity = 2
    val batches = Vector(
      Map("a" -> 5L, "b" -> 3L, "c" -> 1L),
      Map("c" -> 2L, "d" -> 1L),
      Map("a" -> 6L, "e" -> 2L, "b" -> 1L),
    )
    val truth = batches.flatten.groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toMap
    val total = truth.values.sum

    val end = batches.foldLeft(ShardState(Vector.empty, 0L))(
      StreamTopK.absorb(_, _, capacity))

    assert(end.slots.size <= capacity)
    assert(end.total === total)
    end.slots.foreach { case Slot(it, est, err) =>
      val t = truth(it)
      assert(t <= est, s"$it: true $t must be <= est $est")
      assert(est - err <= t, s"$it: est-err ${est - err} must be <= true $t")
      assert(err <= total / capacity)
    }
    // guarantee: any item beating total/capacity is tracked
    // ("a" = 11 > 21/2 — the assertion is non-vacuous by construction)
    val guaranteed = truth.filter(_._2 > total.toDouble / capacity).keys
    assert(guaranteed.nonEmpty)
    guaranteed.foreach { hh =>
      assert(end.slots.exists(_.item == hh), s"heavy hitter $hh must be tracked")
    }
  }

  test("under-capacity stream: state stays bounded and invariants hold at the sink") {
    import spark.implicits._
    val base = Files.createTempDirectory("stopk2").toString
    val b1 = Seq.fill(6)("x") ++ Seq.fill(3)("y") ++ Seq("z")
    val b2 = Seq.fill(4)("x") ++ Seq("w", "w", "z")
    Seq(b1, b2).zipWithIndex.foreach { case (b, i) =>
      b.map(Item(_)).toDS().coalesce(1).write.parquet(s"$base/in/p$i")
      TestSpark.touch(s"$base/in/p$i", 1000L * (i + 1))
    }
    val truth = (b1 ++ b2).groupBy(identity).view.mapValues(_.size.toLong).toMap

    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Item]].schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(s"$base/in")
      .as[Item]
    val q = StreamTopK.summaries(stream, nShards = 1, capacity = 2)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("stopk_tight")
      .trigger(Trigger.ProcessingTime(100))
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()

    val total = truth.values.sum
    // final snapshot = the emission carrying the full shard total
    val fin = spark.sql(s"SELECT item, est, err FROM stopk_tight WHERE shard_total = $total")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(fin.length <= 2)
    fin.foreach { case (it, est, err) =>
      assert(truth(it) <= est)
      assert(est - err <= truth(it))
    }
    // the dominant item survives every eviction round
    assert(fin.exists(_._1 == "x"))
    assert(fin.collectFirst { case ("x", est, _) => est }.get === truth("x"))
  }
}
