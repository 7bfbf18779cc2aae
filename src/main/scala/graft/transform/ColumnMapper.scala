package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.{DBool, DDbl, DInt, DNull, DStr, DVal, TaskSpec}

/** The Spark-first form of the field-mapping transform T1/T3/T6/T7
  * (reference src/processor.ts:51-89) for *fixed-schema* sources: a pure
  * `select` building the mapped output as native columns — fully inside
  * Catalyst (column pruning pushes the mapped-source set down to the
  * scan; whole-stage codegen executes it), no JSON or JVM-object hop.
  *
  * Dotted src paths become nested-field accesses (`col("a.b")`); dotted
  * dst paths are rebuilt as nested structs. The dynamic-document twin of
  * this lives in [[graft.pipeline.ScanJob]] (JSON-string docs through the
  * pure core) — use that only when the source schema is truly unknown.
  */
object ColumnMapper {

  private def litOf(v: DVal): Column = v match {
    case DStr(s)  => lit(s)
    case DInt(i)  => lit(i)
    case DDbl(d)  => lit(d)
    case DBool(b) => lit(b)
    case DNull    => lit(null)
    case other    => lit(other.render)
  }

  /** Build nested struct columns from (dstPath -> Column) pairs,
    * preserving first-seen ordering at each level. A mapping that aims
    * both a flat path and a nested path at the same name (`a` and `a.b`)
    * is contradictory — one would silently shadow the other — so it
    * fails fast instead of dropping a mapped column. */
  def nest(pairs: Seq[(String, Column)]): Seq[Column] = {
    val top = scala.collection.mutable.LinkedHashMap.empty[String, Either[Column, Vector[(String, Column)]]]
    pairs.foreach { case (path, c) =>
      val idx = path.indexOf('.')
      if (idx < 0) {
        if (top.get(path).exists(_.isRight))
          throw new IllegalArgumentException(
            s"conflicting dst paths: flat '$path' vs nested '$path.*' in the same mapping")
        top(path) = Left(c)
      } else {
        val (head, rest) = (path.substring(0, idx), path.substring(idx + 1))
        top.get(head) match {
          case Some(Right(children)) => top(head) = Right(children :+ (rest -> c))
          case Some(Left(_)) =>
            throw new IllegalArgumentException(
              s"conflicting dst paths: flat '$head' vs nested '$path' in the same mapping")
          case None => top(head) = Right(Vector(rest -> c))
        }
      }
    }
    top.map {
      case (name, Left(c))         => c.as(name)
      case (name, Right(children)) => struct(nest(children): _*).as(name)
    }.toSeq
  }

  /** Mapped projection: `idCol` becomes the stringified `id`, each
    * mapping entry projects src -> dst, static literals seed the output,
    * `parent` extracts the routing column (T7). Output columns:
    * `id`, mapped dst columns (nested as needed), optional `parent`.
    */
  def project(df: DataFrame, task: TaskSpec, idCol: String = "_id"): DataFrame = {
    val staticPairs: Seq[(String, Column)] =
      task.static.fields.map { case (k, v) => k -> litOf(v) }
    val mappedPairs: Seq[(String, Column)] =
      task.mapping.map { case (src, dst) => dst -> col(src) }
    val dataCols = nest(staticPairs ++ mappedPairs)
    val base = col(idCol).cast("string").as("id") +: dataCols
    val withParent = task.parent match {
      case Some(p) => base :+ col(p).as("parent")
      case None    => base
    }
    df.select(withParent: _*)
  }

  /** Same projection but wrapping the mapped fields in a single `data`
    * struct column (the IR shape: id, data, parent). */
  def projectAsIR(df: DataFrame, task: TaskSpec, idCol: String = "_id", tsCol: Option[String] = None): DataFrame = {
    val staticPairs: Seq[(String, Column)] =
      task.static.fields.map { case (k, v) => k -> litOf(v) }
    val mappedPairs: Seq[(String, Column)] =
      task.mapping.map { case (src, dst) => dst -> col(src) }
    val cols = Seq(
      lit("upsert").as("action"),
      col(idCol).cast("string").as("id"),
      struct(nest(staticPairs ++ mappedPairs): _*).as("data"),
      task.parent.map(p => col(p).cast("string")).getOrElse(lit(null: String)).as("parent"),
      tsCol.map(col(_).cast("long")).getOrElse(lit(0L)).as("timestamp"),
    )
    df.select(cols: _*)
  }
}
