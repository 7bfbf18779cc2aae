package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Random-hyperplane LSH signature as one native expression: given a
  * vector and a (literal/broadcast) plane set `array<array<double>>`,
  * return a long whose bit i is `dot(v, planes[i]) > 0`.
  *
  * The composable form — `aggregate(transform(planes, p ->
  * if(aggregate(zip_with(v, p, ...)...) > 0, 1, 0)), ...)` — runs three
  * nested higher-order lambdas in Catalyst's interpreter with a
  * `zip_with` array allocation per plane per row (the same boxing tax
  * DESIGN.md measured at ~3x for the plain dot product). This is a
  * primitive double loop reusing [[VectorMath.dot]] (sequential
  * left-to-right, bitwise-identical to the lambda fold and to the
  * oracle's `list_dot_product`), inlines into whole-stage codegen, and
  * allocates nothing.
  */
case class SignBits(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sign_bits"

  override def nullSafeEval(v: Any, planes: Any): Any =
    SignMath.signBits(v.asInstanceOf[ArrayData], planes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, p) => s"graft.expressions.SignMath.signBits($v, $p)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SignBits =
    copy(left = newLeft, right = newRight)
}

/** Axis-aligned special case: bit i is `v[i] > 0` for the first `n`
  * elements — the self-derived block key of
  * `dedup_embedding_pairs_lsh`. Same signature family as [[SignBits]]
  * with unit-basis planes, minus the 64-multiply dot product per bit
  * (an element read suffices when the plane is e_i).
  */
case class ElementSignBits(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "element_sign_bits"

  override def nullSafeEval(v: Any): Any =
    SignMath.elementSignBits(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.expressions.SignMath.elementSignBits($v, $n)")

  override protected def withNewChildInternal(newChild: Expression): ElementSignBits =
    copy(child = newChild)
}

object SignMath {
  /** Called from generated code via the static forwarder. `planes` rows
    * are array<double>; bit i set iff dot(v, planes[i]) > 0 (strict,
    * like the lambda's `> 0D`; NaN compares false on both paths). */
  def signBits(v: ArrayData, planes: ArrayData): Long = {
    var sig = 0L
    var i = 0
    val n = planes.numElements()
    // a long holds 64 sign bits; beyond that `1L << i` wraps (shift mod
    // 64) and would silently CORRUPT the signature — fail fast instead,
    // matching element_sign_bits' [0, 64] range check
    if (n > 64)
      throw new IllegalArgumentException(
        s"sign_bits supports at most 64 hyperplanes (one bit each in the long signature); got $n")
    while (i < n) {
      if (VectorMath.dot(v, planes.getArray(i)) > 0d) sig |= 1L << i
      i += 1
    }
    sig
  }

  /** Bit i set iff v[i] > 0, for i in [0, n); null elements count 0. */
  def elementSignBits(v: ArrayData, n: Int): Long = {
    var sig = 0L
    var i = 0
    val m = math.min(n, v.numElements())
    while (i < m) {
      if (!v.isNullAt(i) && v.getDouble(i) > 0d) sig |= 1L << i
      i += 1
    }
    sig
  }
}

object SignFunctions {
  /** Column form: LSH signature of an array<double> vector against an
    * array<array<double>> plane set. */
  def signBits(v: Column, planes: Column): Column =
    GraftColumnBridge.column(SignBits(
      GraftColumnBridge.expression(v), GraftColumnBridge.expression(planes)))

  /** Column form: axis-aligned n-bit sign signature of an array<double>. */
  def elementSignBits(v: Column, n: Int): Column =
    GraftColumnBridge.column(ElementSignBits(GraftColumnBridge.expression(v), n))
}
