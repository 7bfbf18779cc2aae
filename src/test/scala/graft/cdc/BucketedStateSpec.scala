package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.model.{BsonTs, TaskSpec}

/** The at-scale configuration of the CDC state join (DESIGN.md): state
  * stored BUCKETED on the document key means the dispatch join reads
  * state co-located — only the (small) micro-batch side shuffles, the
  * 100 TB state side never moves. This pins that property on the real
  * Dispatcher, not a toy join.
  */
class BucketedStateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val task = TaskSpec(Vector("value" -> "value"))

  test("dispatcher state join against bucketed state: no state-side shuffle") {
    import OplogRow.encoder
    val wh = java.nio.file.Files.createTempDirectory("cdc-bucketed").toString
    spark.sql("DROP TABLE IF EXISTS cdc_state_bucketed")
    val stateRows = (0 until 64).map(i => (s"k$i", s"""{"_id":"k$i","value":$i.0}""", null.asInstanceOf[String], 1L))
    spark.createDataFrame(stateRows).toDF("id", "doc", "parent", "ts")
      .write.bucketBy(8, "id").sortBy("id")
      .option("path", s"$wh/state").saveAsTable("cdc_state_bucketed")
    val state = spark.table("cdc_state_bucketed")

    val batch = spark.createDataset((0 until 16).map(i =>
      OplogRow(BsonTs(5, i).toLong, "u", "db.c", s"k$i", s"""{"$$set":{"value":${i + 100}.0}}""")))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val irs = Dispatcher.dispatch(batch, task, Some(state))
      val plan = irs.queryExecution.executedPlan.toString
      // the state scan reads its buckets in place (Bucketed: true) and
      // nothing re-partitions the state columns (__sid): the only
      // exchange in the join belongs to the micro-batch side
      assert(plan.contains("Bucketed: true"), s"state scan not bucketed:\n${plan.take(2000)}")
      assert(!plan.contains("hashpartitioning(__sid"),
        s"state side must not shuffle:\n${plan.take(2500)}")

      // and the result equals the unbucketed dispatch
      val got = irs.collect().map(ir => ir.id -> ir.data).toMap
      val plain = Dispatcher.dispatch(batch, task,
        Some(spark.createDataFrame(stateRows).toDF("id", "doc", "parent", "ts")))
        .collect().map(ir => ir.id -> ir.data).toMap
      assert(got === plain)
      assert(got.size === 16)
      assert(got("k3") === """{"value":103.0}""")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE cdc_state_bucketed")
    }
  }
}
