package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** In-flight anomaly scoring — the streaming twin of the batch
  * `events_anomaly_zscore` query: each event is scored against its
  * user's RUNNING baseline the moment it arrives, instead of a
  * trailing window recomputed per batch.
  *
  * State is a Welford accumulator (n, mean, M2) per user — O(1) per
  * key, numerically stable, mergeable — kept in `transformWithState`
  * ValueState with a TTL so dormant users age out of the store. The
  * event is scored against the baseline BEFORE it updates it (a wild
  * outlier must not mask itself by inflating the variance it is
  * measured against), which is also what makes the decision
  * replay-deterministic per key-ordered input.
  *
  * Scale shape: one user_id exchange, RocksDB-resident state sized by
  * active users within TTL, no window materialization at all — the
  * batch query's RANGE frame holds the horizon's events per user;
  * this holds three doubles.
  */
object StreamAnomaly {

  final case class Ev(ts: Timestamp, user_id: Long, event_id: Long, value: Double)

  final case class Welford(n: Long, mean: Double, m2: Double) {
    /** One Welford step — the single production update, also exercised
      * directly by the spec's numeric reference test. */
    def add(x: Double): Welford = {
      val n1 = n + 1
      val d = x - mean
      val mean1 = mean + d / n1
      Welford(n1, mean1, m2 + d * (x - mean1))
    }
    def sampleVariance: Double = if (n >= 2) m2 / (n - 1) else 0.0
  }
  final case class Scored(
      ts: Timestamp, user_id: Long, event_id: Long, value: Double,
      n_baseline: Long, z: Double, is_outlier: Boolean)

  /** Minimum baseline size (strict predecessors) before scoring. The
    * batch twin's `n_win >= 5` RANGE frame INCLUDES the scored event,
    * so this floor is one event stricter — deliberately: the streaming
    * baseline is self-exclusive (the event never contributes to the
    * mean/sd it is judged against), which is the whole point of
    * pre-update scoring. */
  val MinBaseline = 5L

  final class Processor(zCut: Double, ttl: TTLConfig)
      extends StatefulProcessor[Long, Ev, Scored] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[Welford] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Welford]("welford", Encoders.product[Welford], ttl)

    override def handleInputRows(
        key: Long, rows: Iterator[Ev], timers: TimerValues): Iterator[Scored] = {
      var w = if (st.exists()) st.get() else Welford(0L, 0.0, 0.0)
      val out = Vector.newBuilder[Scored]
      // event-time order within the batch: the baseline each event sees
      // is exactly the set of its predecessors
      rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val sd = math.sqrt(w.sampleVariance)
        val scorable = w.n >= MinBaseline && sd > 0
        val z = if (scorable) (e.value - w.mean) / sd else 0.0
        out += Scored(e.ts, key, e.event_id, e.value, w.n,
          z, scorable && math.abs(z) >= zCut)
        w = w.add(e.value) // AFTER scoring
      }
      st.update(w)
      out.result().iterator
    }
  }

  /** Wire in-flight scoring onto a streaming Dataset[Ev].
    *
    * `ttl = Some(d)` ages dormant users out of the store (the unbounded-
    * key-domain deployment shape) and requires `TimeMode.ProcessingTime`
    * — whose trigger loop keeps running housekeeping micro-batches, so
    * drive such a query by sink progress, not `processAllAvailable()`
    * (which never sees the stream go idle). `ttl = None` keeps state for
    * every user ever seen (`TimeMode.None`) — right for bounded user
    * domains, and what a drain-the-input test can await. */
  def scored(
      events: Dataset[Ev],
      zCut: Double = 3.0,
      ttl: Option[java.time.Duration] = Some(java.time.Duration.ofDays(7)),
  ): Dataset[Scored] = {
    implicit val outEnc = Encoders.product[Scored]
    implicit val longEnc = Encoders.scalaLong
    val (mode, cfg) = ttl match {
      case Some(d) => (TimeMode.ProcessingTime(), TTLConfig(d))
      case None    => (TimeMode.None(), TTLConfig.NONE)
    }
    events
      .groupByKey(_.user_id)
      .transformWithState(new Processor(zCut, cfg), mode, OutputMode.Append())
  }
}
