package graft.cdc

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Transformer
import graft.model.TaskSpec

/** Micro-batch oplog compaction (C2/O4, reference src/processor.ts:260-297)
  * as a Spark operator.
  *
  * Two forms, per SURVEY.md §2.4 C2:
  *
  *  - [[compact]] — the exact reference semantics (insert folding,
  *    u+u deep-merge, i+d annihilation) as a typed
  *    `groupByKey(ns,id).flatMapGroups` over the pure core fold. One
  *    shuffle on the key; the per-group fold is O(events-per-key) and
  *    state never exceeds one event per key, so executor memory is bounded
  *    by events-per-key within a micro-batch, not batch size. At 100 TB /
  *    1000 executors this is the same hash-shuffle any keyed aggregation
  *    pays, and AQE coalesces/splits the post-shuffle partitions.
  *
  *  - [[compactLww]] — the relational last-writer-wins special case
  *    (`row_number over (partition by ns,id order by ts desc) = 1`),
  *    valid when events are full replacements (no `$set` folding). Stays
  *    fully inside Catalyst/Tungsten (whole-stage codegen, no JVM object
  *    churn) and is what the DuckDB oracle can express.
  */
object Compactor {

  /** Exact reference compaction. Input/output: OplogRow datasets.
    * Malformed events are dropped rather than failing the batch
    * (reference src/processor.ts:219-222 error contract). */
  def compact(ds: Dataset[OplogRow], task: TaskSpec): Dataset[OplogRow] = {
    import OplogRow.encoder
    ds.groupByKey(r => (r.ns, r.id))(org.apache.spark.sql.Encoders.product[(String, String)])
      .flatMapGroups { (_, rows) =>
        val parsed = rows.flatMap(r => scala.util.Try(r.toCore).toOption).toSeq
        Transformer.mergeOplogs(task, parsed).iterator.map(OplogRow.fromCore)
      }
  }

  /** Relational LWW twin: latest event per (ns, id). `tieBreak` columns
    * break equal-ts ties deterministically. */
  def compactLww(df: DataFrame, tieBreak: Seq[String] = Nil): DataFrame = {
    val order = (col("ts").desc +: tieBreak.map(col(_).desc))
    val w = Window.partitionBy(col("ns"), col("id")).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Streaming-source predicate set P3 (reference src/mongodb.ts:46-54):
    * namespace equality, ts lower bound, and the null-safe
    * `fromMigrate != true` (missing field matches, like Mongo `$ne`). */
  def streamFilters(df: DataFrame, ns: String, fromTs: Long): DataFrame =
    df.filter(
      col("ns") === ns &&
        col("ts") >= fromTs &&
        !coalesce(col("fromMigrate"), lit(false)))
}
