package graft.expressions

import java.math.RoundingMode

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** IVF cell assignment as a native per-row argmax: given a vector, its
  * norm, and the (broadcast) codebook as `array<struct<cid, cv, cn>>`,
  * return the centroid id with the highest 4-dp-rounded cosine
  * (centroid-id ascending breaks ties).
  *
  * The composable forms both lose at scale: a `row_number` window
  * partitioned by vec_id shuffles+sorts the whole corpus, a `max_by`
  * aggregation still exchanges one row per vector, and an `aggregate`
  * lambda fold evaluates interpreted closures with a `zip_with`
  * allocation per centroid per row. This is a primitive loop reusing
  * [[VectorMath.dot]], inlines into whole-stage codegen, and needs no
  * exchange at all — assignment stays a projection.
  *
  * Rounding replicates `Registry.rnd(_, 4)` exactly (double →
  * DECIMAL(18,8) → HALF_UP round to 4 → double), so results are
  * bitwise-identical to the relational form the DuckDB oracle runs.
  */
case class NearestCell(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_cell"

  override def nullSafeEval(v: Any, nrm: Any, cells: Any): Any =
    CellMath.nearest(v.asInstanceOf[ArrayData], nrm.asInstanceOf[Double],
      cells.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, n, c) => s"graft.expressions.CellMath.nearest($v, $n, $c)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): NearestCell =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CellMath {
  /** Decimal-exact 4-dp rounding: the same value path as
    * `round(cast(x AS decimal(18,8)), 4)` (toString-based BigDecimal,
    * HALF_UP at scale 8 then 4). */
  def rnd4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(8, RoundingMode.HALF_UP)
      .setScale(4, RoundingMode.HALF_UP)
      .doubleValue()

  /** Called from generated code via the static forwarder. `cells` rows
    * are struct(cid: long, cv: array<double>, cn: double).
    *
    * Non-finite sims (zero-norm vector or centroid) rank like the
    * relational form's NULLs: below every finite sim (DESC ordering is
    * nulls-last), min-cid tie-break among themselves — and never crash
    * (`BigDecimal.valueOf(NaN)` would; the decimal cast in the
    * relational form yields NULL instead). */
  def nearest(v: ArrayData, nrm: Double, cells: ArrayData): Long = {
    var bestSim = -2.0 // below any finite cosine
    var bestCid = -1L
    var haveFinite = false
    var fallbackCid = -1L // min cid among non-finite candidates
    var haveFallback = false
    var i = 0
    val n = cells.numElements()
    while (i < n) {
      val c = cells.getStruct(i, 3)
      val cid = c.getLong(0)
      val raw = VectorMath.dot(v, c.getArray(1)) / (nrm * c.getDouble(2))
      if (java.lang.Double.isFinite(raw)) {
        val sim = rnd4(raw)
        if (!haveFinite || sim > bestSim || (sim == bestSim && cid < bestCid)) {
          haveFinite = true
          bestSim = sim
          bestCid = cid
        }
      } else if (!haveFallback || cid < fallbackCid) {
        haveFallback = true
        fallbackCid = cid
      }
      i += 1
    }
    if (haveFinite) bestCid else fallbackCid
  }

  /** Top-p centroid ids by (rounded cosine DESC, cid ASC), finite sims
    * ranking above non-finite ones (matching the relational DESC
    * nulls-last) — a p-slot insertion sort, p tiny by construction.
    * Called from generated code via the static forwarder. */
  def nearestP(v: ArrayData, nrm: Double, cells: ArrayData, p: Int): ArrayData = {
    val n = cells.numElements()
    val k = math.min(p, n)
    // slot arrays: sims (NaN = non-finite candidate), cids, filled count
    val sims = new Array[Double](k)
    val cids = new Array[Long](k)
    var filled = 0
    def beats(sim: Double, cid: Long, j: Int): Boolean = {
      val sj = sims(j)
      val fi = !sim.isNaN
      val fj = !sj.isNaN
      if (fi != fj) fi // finite outranks non-finite
      else if (fi && sim != sj) sim > sj
      else cid < cids(j)
    }
    var i = 0
    while (i < n) {
      val c = cells.getStruct(i, 3)
      val cid = c.getLong(0)
      val raw = VectorMath.dot(v, c.getArray(1)) / (nrm * c.getDouble(2))
      val sim = if (java.lang.Double.isFinite(raw)) rnd4(raw) else Double.NaN
      // find insertion position among the filled slots
      var pos = filled
      while (pos > 0 && beats(sim, cid, pos - 1)) pos -= 1
      if (pos < k) {
        val last = math.min(filled, k - 1)
        var j = last
        while (j > pos) { sims(j) = sims(j - 1); cids(j) = cids(j - 1); j -= 1 }
        sims(pos) = sim
        cids(pos) = cid
        if (filled < k) filled += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(cids, filled))
  }
}

/** Multi-probe form of [[NearestCell]]: the `p` nearest centroid ids,
  * rank order (rounded-cosine DESC, cid ASC ties — the exact ordering
  * the relational `row_number` oracle uses). Still a pure projection:
  * the standard IVF recall knob (probe p cells instead of 1) costs a
  * p-slot insertion pass over the broadcast codebook per row, no
  * exchange, no window. */
case class NearestCells(first: Expression, second: Expression, third: Expression, p: Int)
    extends TernaryExpression {
  require(p >= 1, s"nProbe must be >= 1, got $p")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_cells"

  override def nullSafeEval(v: Any, nrm: Any, cells: Any): Any =
    CellMath.nearestP(v.asInstanceOf[ArrayData], nrm.asInstanceOf[Double],
      cells.asInstanceOf[ArrayData], p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, n, c) => s"graft.expressions.CellMath.nearestP($v, $n, $c, $p)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): NearestCells =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CellFunctions {
  /** Column form: nearest-centroid id for an array<double> vector
    * against an array<struct<cid, cv, cn>> codebook. */
  def nearestCell(v: Column, nrm: Column, cells: Column): Column =
    GraftColumnBridge.column(NearestCell(
      GraftColumnBridge.expression(v),
      GraftColumnBridge.expression(nrm),
      GraftColumnBridge.expression(cells)))

  /** Column form: the p nearest centroid ids in rank order. */
  def nearestCells(v: Column, nrm: Column, cells: Column, p: Int): Column =
    GraftColumnBridge.column(NearestCells(
      GraftColumnBridge.expression(v),
      GraftColumnBridge.expression(nrm),
      GraftColumnBridge.expression(cells), p))
}
