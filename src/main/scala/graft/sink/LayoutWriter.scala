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
  def zordered(df: DataFrame, dimA: String, dimB: String, nFiles: Int): DataFrame = {
    val cols = df.columns.toSeq
    val bounds = df.agg(
      min(col(dimA)).as("__amin"), max(col(dimA)).as("__amax"),
      min(col(dimB)).as("__bmin"), max(col(dimB)).as("__bmax"))
    // The affine map runs in bigint: in the column's native type an
    // IntegerType dimension with range > 2^31/255 would wrap the *255
    // silently under non-ANSI evaluation and corrupt the Morton keys.
    df.crossJoin(broadcast(bounds))
      .withColumn("__qa",
        expr(s"((cast($dimA as bigint) - __amin) * 255L) div greatest(cast(__amax as bigint) - __amin, 1)"))
      .withColumn("__qb",
        expr(s"((cast($dimB as bigint) - __bmin) * 255L) div greatest(cast(__bmax as bigint) - __bmin, 1)"))
      .withColumn("__z", expr(Layout.mortonExpr("__qa", "__qb", "div")))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .select(cols.map(col): _*)
  }
}
