package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.core.Transformer
import graft.model._

/** Cross-batch property test: random oplog micro-batches applied
  * sequentially through the distributed BatchApplier must equal a pure
  * in-memory model fold with the same semantics (mergeOplogs ->
  * dispatch-with-state -> LWW). Exercises cross-batch `$set` resolution
  * against accumulated state — the path the single-batch goldens can't
  * cover.
  */
class MultiBatchPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val task = TaskSpec(Vector("f.a" -> "a", "f.b" -> "b"))

  private def randomOplog(rnd: scala.util.Random, tsBase: Int): OplogRow = {
    val key = s"k${rnd.nextInt(6)}"
    val ts = BsonTs(tsBase, rnd.nextInt(1000))
    val v = rnd.nextInt(50)
    rnd.nextInt(4) match {
      case 0 => // insert
        OplogRow(ts.toLong, "i", "db.c", key,
          s"""{"_id":"$key","f":{"a":$v,"b":${v + 1}}}""")
      case 1 => // $set update
        OplogRow(ts.toLong, "u", "db.c", key, s"""{"$$set":{"f.a":$v}}""")
      case 2 => // replacement update
        OplogRow(ts.toLong, "u", "db.c", key, s"""{"f":{"a":$v}}""")
      case _ => // delete
        OplogRow(ts.toLong, "d", "db.c", key, s"""{"_id":"$key"}""")
    }
  }

  /** Pure model of one batch apply over a state map (same fold as
    * BatchApplier's per-key logic). */
  private def modelApply(state: Map[String, (String, Long)], batch: Seq[OplogRow]): Map[String, (String, Long)] = {
    val byKey = batch.groupBy(_.id)
    val untouched = state.view.filterKeys(k => !byKey.contains(k)).toMap
    val touched = byKey.flatMap { case (id, rows) =>
      val sinkDoc = state.get(id).map(s => Json.parseObj(s._1))
      val irs = Transformer.mergeOplogs(task, rows.map(_.toCore)).flatMap { o =>
        Transformer.dispatch(task, o, sinkDoc, None)
      }
      val candidates = state.get(id).map(s => (s._2, 0, "state", s._1)).toVector ++
        irs.map { ir =>
          val doc = ir.data.map(d =>
            DObj(("_id" -> DStr(ir.id)) +: d.fields.filterNot(_._1 == "_id")).render).orNull
          (ir.timestamp, 1, ir.action, doc)
        }
      if (candidates.isEmpty) None
      else {
        val w = candidates.maxBy(c => (c._1, c._2))
        if (w._3 == "delete") None else Some(id -> (w._4, w._1))
      }
    }
    untouched ++ touched
  }

  test("N random micro-batches: distributed apply == pure model fold") {
    import OplogRow.encoder
    val rnd = new scala.util.Random(2026)
    var engineState = StateStore.empty(spark)
    var modelState = Map.empty[String, (String, Long)]
    for (batchNo <- 1 to 5) {
      val batch = Vector.fill(12)(randomOplog(rnd, batchNo))
      engineState = BatchApplier.applyOplogBatch(
        spark.createDataset(batch), engineState, task)
      // materialize so each round starts from concrete state
      val got = engineState.collect()
        .map(r => r.getAs[String]("id") -> (r.getAs[String]("doc"), r.getAs[Long]("ts"))).toMap
      modelState = modelApply(modelState, batch)
      assert(got === modelState, s"diverged at batch $batchNo with batch $batch")
      engineState = spark.createDataFrame(
        got.toSeq.map { case (id, (doc, ts)) => (id, doc, null.asInstanceOf[String], ts) })
        .toDF("id", "doc", "parent", "ts")
    }
    assert(modelState.nonEmpty)
  }
}
