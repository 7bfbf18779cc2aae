package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Transformer
import graft.model.{DObj, DStr, Json, Paths, TaskSpec}

/** The CDC op-dispatch C1 (reference src/processor.ts:171-223) as a
  * set-oriented Spark operator.
  *
  * Where the reference resolves `$set`-style updates by *per-row RPC
  * read-back* from the sink (batched mget/terms, S6/S7) with a Mongo
  * `$in` fallback (S5), this engine joins the whole micro-batch against
  * the engine-owned state table in one shuffle (O6 subsumption,
  * SURVEY.md §4) — zero per-row I/O. The full-replacement fast path O7
  * (reference src/processor.ts:186-195) is preserved *set-wise*: only the
  * slice of updates that actually needs prior state participates in the
  * join; inserts, deletes and replacement-updates bypass it entirely.
  *
  * Scale: the state join shuffles both sides on `id` (or broadcasts the
  * batch side when small — micro-batches are bounded by trigger size, so
  * in steady-state streaming the *batch* is the broadcast side against a
  * large state table, making this a broadcast join with no state shuffle).
  */
/** Internal join-result row for [[Dispatcher.dispatch]] — top-level (not
  * nested/private) so Catalyst-generated code can construct it. */
final case class DispatchJoined(
    ts: Long, op: String, ns: String, id: String, doc: String,
    fromMigrate: Boolean, sinkDoc: String, srcDoc: String, sinkParent: String)

object Dispatcher {

  /** Does this row need prior state? `$set`-style updates do — any
    * non-`$` top-level key in `o` means full replacement and skips the
    * join (O7), detected by the native codegen'd
    * [[graft.expressions.JsonAllKeysDollar]] expression (one
    * allocation-free string scan inside whole-stage codegen). Deletes
    * need state too when the task routes by parent: the reference
    * recovers `_parent` from the sink before emitting the delete
    * (reference src/processor.ts:209-213). */
  private def needsState(task: TaskSpec): Column = {
    val setStyleUpdate = col("op") === "u" &&
      graft.expressions.functions.json_all_keys_dollar(col("doc"))
    if (task.parent.isDefined) setStyleUpdate || col("op") === "d"
    else setStyleUpdate
  }

  /**
    * @param compacted  compacted micro-batch (<=1 event per ns+id)
    * @param state      engine-owned sink state: columns (id: string,
    *                   doc: string) where doc is the sink-shaped JSON
    *                   including `_id` — replaces ES read-back S6/S7
    * @param source     optional source snapshot (id, doc) source-shaped —
    *                   replaces the Mongo fallback S5; by construction
    *                   (scan seeds state) rarely needed (SURVEY.md §7.4)
    * @param broadcastState hint when the state table is small enough
    */
  def dispatch(
      compacted: Dataset[OplogRow],
      task: TaskSpec,
      state: Option[DataFrame] = None,
      source: Option[DataFrame] = None,
      broadcastState: Boolean = false,
  ): Dataset[IRRow] = {
    val spark = compacted.sparkSession
    val df = compacted.toDF()

    val direct = df.filter(!needsState(task)) // i, full-replacement u, unrouted d
    val stateful = df.filter(needsState(task)) // $set/$unset u; d when parent-routed

    def maybeB(d: DataFrame): DataFrame = if (broadcastState) broadcast(d) else d

    val sinkJoined = state match {
      case Some(st) =>
        // the sink state's routing column rides along so the reference's
        // _parent re-injection (elasticsearch.ts:150-157) can be replayed
        val parentCol =
          if (st.columns.contains("parent")) col("parent") else lit(null: String)
        stateful.join(
          maybeB(st.select(col("id").as("__sid"), col("doc").as("__sink_doc"),
            parentCol.as("__sink_parent"))),
          col("id") === col("__sid"), "left")
          .drop("__sid")
      case None =>
        stateful
          .withColumn("__sink_doc", lit(null: String))
          .withColumn("__sink_parent", lit(null: String))
    }
    val srcJoined = source match {
      case Some(src) =>
        sinkJoined.join(
          maybeB(src.select(col("id").as("__mid"), col("doc").as("__src_doc"))),
          col("id") === col("__mid"), "left")
          .drop("__mid")
      case None => sinkJoined.withColumn("__src_doc", lit(null: String))
    }

    val cols = Seq("ts", "op", "ns", "id", "doc", "fromMigrate")
    val extra = Seq(col("__sink_doc"), col("__src_doc"), col("__sink_parent"))
    val directJ = direct
      .withColumn("__sink_doc", lit(null: String))
      .withColumn("__src_doc", lit(null: String))
      .withColumn("__sink_parent", lit(null: String))
    val all = directJ.select((cols.map(col) ++ extra): _*)
      .union(srcJoined.select((cols.map(col) ++ extra): _*))

    implicit val jEnc = Encoders.product[DispatchJoined]
    implicit val irEnc = IRRow.encoder
    all
      .withColumnRenamed("__sink_doc", "sinkDoc")
      .withColumnRenamed("__src_doc", "srcDoc")
      .withColumnRenamed("__sink_parent", "sinkParent")
      .na.fill("", Seq("sinkDoc", "srcDoc", "sinkParent"))
      .as[DispatchJoined]
      .flatMap { j =>
        val row = OplogRow(j.ts, j.op, j.ns, j.id, j.doc, j.fromMigrate)
        val sink = Option(j.sinkDoc).filter(_.nonEmpty).map(Json.parseObj).map { d =>
          // replay the reference's _mapResponse: the stored routing value
          // is set back into the doc at the task's parent path so parent
          // extraction on re-transform sees it (elasticsearch.ts:150-157)
          task.parent match {
            case Some(p) if j.sinkParent.nonEmpty => Paths.set(d, p, DStr(j.sinkParent))
            case _                                => d
          }
        }
        val src = Option(j.srcDoc).filter(_.nonEmpty).map(Json.parseObj)
        Transformer.dispatch(task, row.toCore, sink, src).map(IRRow.fromCore)
      }
  }
}
