package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * The composable formulation `aggregate(zip_with(a, b, _*_), 0D, _+_)`
  * allocates an intermediate array and evaluates two lambda closures per
  * element in the interpreter; this expression is a single primitive
  * loop over the two `ArrayData` buffers (no allocation, no boxing) and
  * inlines into whole-stage codegen. Summation is sequential
  * left-to-right — the same order as the composable form and DuckDB's
  * `list_dot_product`, preserving cross-engine bitwise determinism.
  *
  * Null handling: null if either array is null (nullIntolerant); null
  * elements are treated as 0.0 (embeddings never contain nulls).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.VectorMath.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorMath {
  /** Sequential dot product over Catalyst array data (called from
    * generated code via the static forwarder). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

object VectorFunctions {
  /** Column form: dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
