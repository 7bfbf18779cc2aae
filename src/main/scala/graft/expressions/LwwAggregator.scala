package graft.expressions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Last-writer-wins typed aggregator (SURVEY.md §2.6 UDAF surface): the
  * algebraic form of the C2 compaction's pure-replacement case — keep
  * the value with the highest order key. Partial (`reduce`) and final
  * (`merge`) steps are both O(1), so Spark executes it with map-side
  * combine like any built-in aggregate; register with
  * `spark.udf.register("lww_value", functions.udaf(LwwAggregator))`.
  */
object LwwAggregator extends Aggregator[LwwIn, LwwBuf, Double] {
  override def zero: LwwBuf = LwwBuf(0.0, Long.MinValue)
  override def reduce(b: LwwBuf, a: LwwIn): LwwBuf =
    if (a.ord > b.ord) LwwBuf(a.value, a.ord) else b
  override def merge(b1: LwwBuf, b2: LwwBuf): LwwBuf =
    if (b2.ord > b1.ord) b2 else b1
  override def finish(b: LwwBuf): Double = b.value
  override def bufferEncoder: Encoder[LwwBuf] = Encoders.product[LwwBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

final case class LwwIn(value: Double, ord: Long)
final case class LwwBuf(value: Double, ord: Long)
