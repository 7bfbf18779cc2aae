package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Live PSI drift monitoring — the streaming twin of the batch
  * `eval_psi_drift` query: as documents flow in, each source's
  * quality-score histogram accumulates, and every micro-batch emits
  * the source's current PSI against a reference distribution, so a
  * source drifting away from the trusted pool is caught WHILE it
  * routes documents, not at the next offline eval.
  *
  * The reference distribution is STATIC input — the deployment shape:
  * a trusted window is profiled offline (the batch query's own seed
  * histogram, [[referenceFrom]]) and live traffic scores against it.
  * It is structurally TEN rows (a probability has ten bins to land
  * in), so it rides into the processor as a plain constructor capture
  * — the degenerate broadcast — rather than a join.
  *
  * Exactness: documents score through the SAME fixed-weight
  * hard-sigmoid over 3-dp-quantized features as the batch query
  * ([[StreamCalibration.score]], operation-ordered to bit-match the
  * Column expression), bin fractions divide exact integers, the ln()
  * runs on ratios of identical doubles via StrictMath.log (what
  * Spark's `log` expression calls), and each term snaps to 6 dp
  * before an exact decimal sum — so a sealed-horizon emission equals
  * the batch row bit-for-bit (StreamPsiSpec pins it through a
  * multi-micro-batch stream).
  *
  * Scale shape: one exchange on the source key; state is O(10 longs)
  * per source — bounded by the bin domain, not traffic — no TTL
  * needed (the StreamCalibration structural-bound argument).
  */
object StreamPsi {

  final case class Doc(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)
  /** One reference-histogram bin: `refn` docs of `ref_total` landed
    * in `bin` in the trusted pool. */
  final case class RefBin(bin: Int, refn: Long, ref_total: Long)
  final case class PsiState(counts: Array[Long])
  final case class PsiUpdate(source: String, n_docs: Long, psi: Double, drift: String)

  private val psiFloor = 0.0005

  private def rnd(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)
      .setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** PSI of a 10-bin count histogram against the reference fractions —
    * the batch query's exact arithmetic (fractions floored at 5e-4,
    * per-term 6-dp snap, exact decimal sum, 6-dp result). */
  def psiOf(counts: Array[Long], refFrac: Array[Double]): Double = {
    val n = counts.sum
    var acc = BigDecimal(0)
    var b = 0
    while (b < 10) {
      val fp = math.max(counts(b).toDouble / n, psiFloor)
      val fq = math.max(refFrac(b), psiFloor)
      acc += BigDecimal(rnd((fp - fq) * StrictMath.log(fp / fq), 6))
      b += 1
    }
    rnd(acc.toDouble, 6)
  }

  def driftOf(psi: Double): String =
    if (psi > 0.2) "major" else if (psi > 0.1) "moderate" else "stable"

  final class Processor(refFrac: Array[Double])
      extends StatefulProcessor[String, Doc, PsiUpdate] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[PsiState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[PsiState]("psi_bins",
        Encoders.product[PsiState], TTLConfig.NONE)

    override def handleInputRows(
        key: String, rows: Iterator[Doc], timers: TimerValues): Iterator[PsiUpdate] = {
      val c = if (st.exists()) st.get().counts.clone() else new Array[Long](10)
      rows.foreach { d =>
        c(StreamCalibration.binOf(StreamCalibration.score(d.text, d.n_chars))) += 1
      }
      st.update(PsiState(c))
      val psi = psiOf(c, refFrac)
      Iterator.single(PsiUpdate(key, c.sum, psi, driftOf(psi)))
    }
  }

  /** Wire the monitor onto a streaming Dataset[Doc]: one update row per
    * touched source per micro-batch. `ref` is the trusted pool's
    * 10-bin histogram (all ten bins present, zero counts allowed). */
  def monitored(docs: Dataset[Doc], ref: Seq[RefBin]): Dataset[PsiUpdate] = {
    require(ref.map(_.bin).sorted == (0 to 9), s"ref must carry bins 0..9: $ref")
    // fq = refn / ref_total in double — the identical long division the
    // batch expression evaluates
    val refFrac = ref.sortBy(_.bin).map(r => r.refn.toDouble / r.ref_total).toArray
    implicit val outEnc = Encoders.product[PsiUpdate]
    implicit val strEnc = Encoders.STRING
    docs
      .groupByKey(_.source)
      .transformWithState(new Processor(refFrac), TimeMode.None(), OutputMode.Append())
  }

  /** Profile the reference histogram from a corpus dir's seed sources
    * (the batch query's reference pool) — scored distributed through
    * the same row-side model, one tiny collect of <= 10 bin counts. */
  def referenceFrom(spark: SparkSession, dir: String): Seq[RefBin] = {
    implicit val intEnc = Encoders.scalaInt
    val binCounts = graft.ops.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .as[Doc](Encoders.product[Doc])
      .filter((d: Doc) => StreamCalibration.label(d.source) == 1.0)
      .map((d: Doc) => StreamCalibration.binOf(StreamCalibration.score(d.text, d.n_chars)))
      .groupBy(col("value")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = binCounts.values.sum
    (0 to 9).map(b => RefBin(b, binCounts.getOrElse(b, 0L), total))
  }
}
