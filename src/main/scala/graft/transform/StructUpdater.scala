package graft.transform

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.model.TaskSpec

/** `$set`/`$unset` application on *fixed-schema* struct columns — the
  * Catalyst-native twin of the pure core's `applyUpdateMongoDoc` (T4,
  * reference src/processor.ts:91-105): `Column.withField` handles
  * dotted-path create/overwrite, `dropFields` handles `$unset`
  * (SURVEY.md §1.2). Stays entirely inside codegen; use when the
  * document schema is pinned (post-mapping sink shape), versus the
  * JSON-string path for schemaless docs.
  */
object StructUpdater {

  /** Apply one `$set` path -> value onto a struct column. */
  def applySet(doc: Column, path: String, value: Column): Column =
    doc.withField(path, value)

  /** Apply one `$unset` path onto a struct column. */
  def applyUnset(doc: Column, path: String): Column =
    doc.dropFields(path)

  /** The mapped-fields-restricted update of T4: for each mapped src
    * path present in `set`, overwrite; for each truthy path in `unset`,
    * drop. `set`/`unset` are Scala maps of literal updates (the shape a
    * compacted event carries once schemas are fixed). */
  def applyUpdate(
      doc: Column,
      task: TaskSpec,
      set: Map[String, Column],
      unset: Set[String],
  ): Column =
    task.mapping.foldLeft(doc) { case (d, (srcPath, _)) =>
      val afterUnset = if (unset.contains(srcPath)) d.dropFields(srcPath) else d
      set.get(srcPath) match {
        case Some(v) => afterUnset.withField(srcPath, v)
        case None    => afterUnset
      }
    }
}
