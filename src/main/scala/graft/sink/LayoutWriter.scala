package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Z-order clustered parquet writes — the write-side half of the
  * layout operator ([[graft.ops.Layout]] measures clustering quality;
  * this applies it). Sorting the write by the Morton interleave of two
  * key columns gives every output file a tight min/max footprint in
  * BOTH dimensions, so parquet footer/row-group pruning skips data for
  * selective predicates on either column — the difference between
  * scanning 100 TB and scanning the few files whose rectangle a
  * predicate intersects.
  *
  * Shape: one 1-row bounds aggregate (broadcast back), a codegen'd
  * integer projection for the key, then `repartitionByRange(z)` +
  * `sortWithinPartitions(z)` — a single range exchange, the same cost
  * as any sorted write. The helper columns never reach the files.
  */
object LayoutWriter {

  /** Write `df` to `path` as `nFiles` parquet files clustered by the
    * Morton interleave of integer columns `dimA` and `dimB`. */
  def zorderWrite(df: DataFrame, dimA: String, dimB: String, path: String,
      nFiles: Int): Unit =
    zordered(df, dimA, dimB, nFiles)
      .write.mode("overwrite").parquet(path)

  /** The clustered (but unwritten) form, for callers composing their
    * own write options. Output columns = input columns. */
  def zordered(df: DataFrame, dimA: String, dimB: String, nFiles: Int): DataFrame =
    zorderedN(df, Seq(dimA, dimB), nFiles)

  /** N-dimensional clustering (2-4 dims typical; Morton supports up to
    * 7): one 1-row bounds aggregate over all dims, one codegen'd key
    * projection, one range exchange — the same cost at any N. */
  def zorderedN(df: DataFrame, dims: Seq[String], nFiles: Int): DataFrame = {
    val cols = df.columns.toSeq
    val bounds = df.agg(
      min(col(dims.head)).as(s"__min0"),
      (max(col(dims.head)).as(s"__max0") +:
        dims.tail.zipWithIndex.flatMap { case (d, i) =>
          Seq(min(col(d)).as(s"__min${i + 1}"), max(col(d)).as(s"__max${i + 1}"))
        }): _*)
    // The affine map runs in bigint: in the column's native type an
    // IntegerType dimension with range > 2^31/255 would wrap the *255
    // silently under non-ANSI evaluation and corrupt the Morton keys.
    val quantized = dims.zipWithIndex.foldLeft(df.crossJoin(broadcast(bounds))) {
      case (acc, (d, i)) =>
        acc.withColumn(s"__q$i",
          expr(s"((cast($d as bigint) - __min$i) * 255L) div greatest(cast(__max$i as bigint) - __min$i, 1)"))
    }
    quantized
      .withColumn("__z",
        expr(Layout.mortonExprN(dims.indices.map(i => s"__q$i"), "div")))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .select(cols.map(col): _*)
  }
}
