package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Live embedding-centroid drift — the streaming twin of the batch
  * `sim_centroid_drift` query: as new embeddings flow in, each label's
  * running centroid accumulates, and every micro-batch emits the
  * label's cosine drift against a static REFERENCE centroid, so an
  * encoder/data-mix regression is caught while vectors are being
  * ingested, not at the next offline index build.
  *
  * The reference is the trusted snapshot's per-label centroid —
  * profiled offline with the batch query's own arithmetic
  * ([[referenceFrom]] delegates to SimilarityQueries.centroidMeans) —
  * and rides in as a constructor capture (|labels| × d doubles, the
  * StreamPsi degenerate-broadcast argument).
  *
  * Exactness: the batch sums components through DECIMAL(18,8); here
  * each component enters state as a Long count of 1e-8 units snapped
  * the same way (BigDecimal HALF_UP on the shortest double repr — what
  * Spark's float→decimal cast computes), so the running sums are
  * integer-exact, the 6-dp mean reproduces the batch column
  * arithmetic, and the dot products fold left over dims exactly like
  * the batch `aggregate(zip_with(...))`. StreamCentroidDriftSpec pins
  * stream-end drift ≡ the batch row bit-for-bit, through micro-batch
  * cuts and a checkpoint restart.
  *
  * Scale shape: one exchange on the label key; state is O(d) longs per
  * label — bounded by the label domain times embedding width, not
  * traffic — no TTL needed (the StreamCalibration structural-bound
  * argument).
  */
object StreamCentroidDrift {

  final case class Vec(vec_id: Long, label: Int, embedding: Array[Float])
  final case class CentroidState(n: Long, sums: Array[Long])
  final case class DriftUpdate(label: Int, n: Long, drift: Double)

  private def rnd(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)
      .setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Component → integer 1e-8 units, the batch DECIMAL(18,8) snap. */
  private[streaming] def unit8(x: Double): Long =
    BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)
      .underlying.movePointRight(8).longValueExact

  /** 6-dp centroid from integer-exact sums — the batch's
    * `rnd(sum(decimal)/n, 6)` column arithmetic. */
  private[streaming] def meanOf(sums: Array[Long], n: Long): Array[Double] =
    sums.map(s => rnd(java.math.BigDecimal.valueOf(s, 8).doubleValue() / n, 6))

  /** Left-fold dot product over ascending dims — the batch
    * `aggregate(zip_with(a, b, (p,q) -> p*q), 0D, +)` order. */
  private[streaming] def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  def driftOf(c: Array[Double], ref: Array[Double]): Double =
    rnd(1.0 - dot(ref, c) / (math.sqrt(dot(ref, ref)) * math.sqrt(dot(c, c))), 6)

  final class Processor(ref: Map[Int, Array[Double]])
      extends StatefulProcessor[Int, Vec, DriftUpdate] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[CentroidState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CentroidState]("centroid",
        Encoders.product[CentroidState], TTLConfig.NONE)

    override def handleInputRows(
        key: Int, rows: Iterator[Vec], timers: TimerValues): Iterator[DriftUpdate] = {
      var s: CentroidState = if (st.exists()) st.get() else null
      rows.foreach { v =>
        if (s == null) s = CentroidState(0L, new Array[Long](v.embedding.length))
        val sums = s.sums.clone()
        var i = 0
        while (i < sums.length) { sums(i) += unit8(v.embedding(i).toDouble); i += 1 }
        s = CentroidState(s.n + 1, sums)
      }
      if (s == null) Iterator.empty
      else {
        st.update(s)
        ref.get(key) match {
          case Some(r) =>
            Iterator.single(DriftUpdate(key, s.n, driftOf(meanOf(s.sums, s.n), r)))
          case None => Iterator.empty // unprofiled label: nothing to score against
        }
      }
    }
  }

  /** Wire the monitor onto a streaming Dataset[Vec]: one update row per
    * touched (profiled) label per micro-batch. */
  def monitored(vecs: Dataset[Vec], ref: Seq[(Int, Array[Double])]): Dataset[DriftUpdate] = {
    implicit val outEnc = Encoders.product[DriftUpdate]
    implicit val intEnc = Encoders.scalaInt
    val refMap = ref.toMap
    vecs.groupByKey(_.label)
      .transformWithState(new Processor(refMap), TimeMode.None(), OutputMode.Append())
  }

  /** The trusted snapshot's per-label centroids (the batch query's
    * half-0 side, its exact arithmetic): |labels| rows collected. */
  def referenceFrom(spark: SparkSession, dir: String): Seq[(Int, Array[Double])] =
    graft.llm.SimilarityQueries.centroidMeans(spark, dir)
      .filter(col("half") === 0)
      .select(col("label"), col("c"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toSeq
}
