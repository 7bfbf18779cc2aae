package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.{broadcast, col, round => sqlRound}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** On-line CUSUM drift monitoring — the streaming twin of the batch
  * `events_cusum_drift` query. The batch form computes the statistic
  * via the prefix-min reflection (two window passes); on a live stream
  * the textbook recursion S = max(0, S + d) IS the natural shape:
  * one number of state per user, one update per event.
  *
  * Baselines (per-user mean/slack/threshold) arrive as a STATIC
  * DataFrame — the deployment shape: a reference window is profiled
  * offline (the batch query itself produces it) and the monitor scores
  * live traffic against it. The join is stream-static broadcast (the
  * StreamEnrich discipline), so baselines never shuffle the stream.
  *
  * Exactness: the batch query does all arithmetic in DECIMAL(·,6).
  * Here every quantity is a Long count of MICRO-units (value·1e6), so
  * the recursion is integer-exact and lands bit-for-bit on the batch
  * statistic — CusumSpec pins per-user (n_alerts, first_alert_sec,
  * max_stat) equality through a real ts-ordered micro-batched stream.
  *
  * Scale shape: one user_id exchange for the stateful op, O(1) state
  * (one Long + running max + alert bookkeeping) per active user in
  * RocksDB, baselines broadcast. Exact for any ts-ordered
  * micro-batching (the StreamFunnel discipline): rows are re-sorted
  * by (ts, event_id) inside each batch, so only cross-batch order
  * must come from the source.
  */
object StreamCusum {

  final case class Ev(ts: Timestamp, user_id: Long, event_id: Long, value: Double)
  /** Event enriched with its user's baseline, all in micro-units. */
  final case class EvB(
      ts: Timestamp, user_id: Long, event_id: Long, value: Double,
      mu_micro: Long, k_micro: Long, h_micro: Long)
  final case class CusumState(s_micro: Long)
  final case class Scored(
      user_id: Long, event_id: Long, sec: Long, stat: Double, alert: Boolean)

  /** value → integer micro-units with the batch twin's exact snap.
    * The batch query casts DOUBLE to DECIMAL(18,6), which rounds
    * HALF_UP on the shortest decimal repr (away from zero); a bare
    * math.round(v*1e6) rounds half toward +∞ instead, so the two
    * disagree on negative values carrying more than 6 decimal places
    * (e.g. −0.0000005 → −1 micro there, 0 here). */
  private[streaming] def micro(v: Double): Long =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .underlying.movePointRight(6).longValueExact

  final class Processor extends StatefulProcessor[Long, EvB, Scored] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[CusumState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CusumState](
        "cusum", Encoders.product[CusumState], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[EvB], timers: TimerValues): Iterator[Scored] = {
      var s = if (st.exists()) st.get().s_micro else 0L
      val out = Vector.newBuilder[Scored]
      rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val d = micro(e.value) - e.mu_micro - e.k_micro
        s = math.max(0L, s + d)
        out += Scored(key, e.event_id, e.ts.getTime / 1000L,
          s.toDouble / 1e6, s > e.h_micro)
      }
      st.update(CusumState(s))
      out.result().iterator
    }
  }

  /** Convert a (user_id, mu, sigma) baseline frame — the batch query's
    * own output shape — to micro-unit slack/threshold columns, with the
    * batch query's exact snapping (k = round(sigma/2, 6dp),
    * h = round(4·sigma, 6dp)). */
  def baselineMicros(baseline: DataFrame): DataFrame =
    baseline.select(
      col("user_id"),
      sqlRound(col("mu").cast("decimal(18,8)"), 6).cast("decimal(18,6)")
        .*(1000000L).cast("long").as("mu_micro"),
      sqlRound((col("sigma") * 0.5).cast("decimal(18,8)"), 6).cast("decimal(18,6)")
        .*(1000000L).cast("long").as("k_micro"),
      sqlRound((col("sigma") * 4.0).cast("decimal(18,8)"), 6).cast("decimal(18,6)")
        .*(1000000L).cast("long").as("h_micro"))

  /** Wire CUSUM scoring onto a streaming Dataset[Ev]. `baseline` is a
    * STATIC (user_id, mu, sigma) frame; users without a baseline are
    * not scored (inner join — a deployment alerts on profiled
    * populations only). */
  def scored(events: Dataset[Ev], baseline: DataFrame): Dataset[Scored] = {
    implicit val evbEnc = Encoders.product[EvB]
    implicit val outEnc = Encoders.product[Scored]
    implicit val longEnc = Encoders.scalaLong
    events.toDF()
      .join(broadcast(baselineMicros(baseline)), Seq("user_id"))
      .select(col("ts"), col("user_id"), col("event_id"), col("value"),
        col("mu_micro"), col("k_micro"), col("h_micro"))
      .as[EvB]
      .groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append())
  }
}
