package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Online calibration monitoring — the streaming twin of the batch
  * `eval_calibration_bins` query: as documents flow in, each lands in
  * its predicted-probability bin and updates that bin's running
  * (count, mean prediction, observed seed fraction); the per-batch
  * emission carries the current gap and a drift flag, so a
  * miscalibrating quality gate is caught WHILE it routes documents,
  * not at the next offline eval.
  *
  * The model is the SAME fixed-weight hard-sigmoid over the same
  * 3-dp-quantized features as the batch query (and
  * text_quality_lr_step) — scored row-side in plain Scala with the
  * identical operation order, so a document's bin here is bit-equal
  * to its bin there, and the spec pins stream-end state ≡ batch
  * output on the same corpus.
  *
  * Scale shape: one exchange on the bin key; state is O(bins) — ten
  * keys of three numbers — no TTL needed because the key domain is
  * structurally bounded (a probability has nowhere else to go), the
  * one stateful twin where unbounded-state concerns vanish by
  * construction rather than by timeout.
  */
object StreamCalibration {

  final case class Doc(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)
  final case class BinStats(n: Long, sumP: Double, sumY: Double)
  final case class BinUpdate(bin: Int, n: Long, mean_p: Double,
      frac_pos: Double, gap: Double, drifted: Boolean)

  /** src0-src4 = curated seed (the lrSeedSources convention). */
  private val seedSources = Set("src0", "src1", "src2", "src3", "src4")
  private val stopwords = Set("the", "a", "and", "of", "to", "in")

  private def rnd(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)
      .setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The hard-sigmoid seed probability — operation-ordered exactly like
    * the batch query's Column expression (left-assoc sum of weighted
    * 3-dp features), so bins agree bit-for-bit. */
  def score(text: String, nChars: Long): Double = {
    val ws = text.split(" ", -1)
    val nWords = ws.length.toLong
    val nStop = ws.count(stopwords.contains).toLong
    val f1 = rnd(nStop.toDouble / nWords, 3)
    val f2 = rnd(math.min(nWords.toDouble / 100.0, 1.0), 3)
    val f3 = rnd((nChars - nWords + 1).toDouble / nWords / 10.0, 3)
    val z = 0.1 + (-0.2 * f1) + (0.3 * f2) + (0.05 * f3)
    math.min(math.max(0.5 + z / 4.0, 0.0), 1.0)
  }

  def label(source: String): Double = if (seedSources(source)) 1.0 else 0.0

  def binOf(p: Double): Int = math.min(math.floor(p * 10).toInt, 9)

  /** Per-bin running stats; sums are of 6-dp-quantized per-row values
    * (the batch query's mean6 discipline), means re-quantize on read. */
  final class Processor(minN: Long, gapCut: Double)
      extends StatefulProcessor[Int, Doc, BinUpdate] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[BinStats] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[BinStats]("bin_stats",
        Encoders.product[BinStats], TTLConfig.NONE)

    override def handleInputRows(
        key: Int, rows: Iterator[Doc], timers: TimerValues): Iterator[BinUpdate] = {
      var s = if (st.exists()) st.get() else BinStats(0L, 0.0, 0.0)
      rows.foreach { d =>
        val p = score(d.text, d.n_chars)
        s = BinStats(s.n + 1, s.sumP + rnd(p, 6), s.sumY + rnd(label(d.source), 6))
      }
      st.update(s)
      val meanP = rnd(s.sumP / s.n, 6)
      val fracPos = rnd(s.sumY / s.n, 6)
      val gap = rnd(meanP - fracPos, 6)
      Iterator.single(BinUpdate(key, s.n, meanP, fracPos, gap,
        s.n >= minN && math.abs(gap) > gapCut))
    }
  }

  /** Wire the monitor onto a streaming Dataset[Doc]: one update row per
    * touched bin per micro-batch, carrying the running calibration
    * table. `minN` suppresses the drift flag until a bin has enough
    * mass to mean anything; `gapCut` is the |mean_p − frac_pos| alarm
    * threshold. */
  def monitored(
      docs: Dataset[Doc],
      minN: Long = 30L,
      gapCut: Double = 0.15,
  ): Dataset[BinUpdate] = {
    implicit val outEnc = Encoders.product[BinUpdate]
    implicit val intEnc = Encoders.scalaInt
    docs
      .groupByKey(d => binOf(score(d.text, d.n_chars)))
      .transformWithState(new Processor(minN, gapCut), TimeMode.None(), OutputMode.Append())
  }
}
