package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Inactivity-closed user sessions via `transformWithState` — Spark 4's
  * arbitrary-stateful-processing API (StatefulProcessor + typed state
  * variables + timers), the successor to `flatMapGroupsWithState` used
  * by [[StatefulCounts]]/[[StreamNearDedup]].
  *
  * What the built-in `session_window` aggregation (events_session_window)
  * cannot express and this operator adds: a session row is emitted
  * EXACTLY ONCE, exactly when the session closes — an event-time timer
  * armed at `last event + gap` fires when the watermark passes it —
  * rather than whenever the aggregation state happens to finalize. That
  * on-close emission is the shape alerting/billing consumers need.
  *
  * State discipline at scale: one span-list row and one armed timer
  * per ACTIVE user (cleared on close) — state is O(concurrently
  * unexpired spans), not O(events) and not O(users ever seen). The
  * state store is RocksDB (transformWithState requires it), which is
  * also the provider a 100 TB deployment runs for state larger than
  * executor heaps.
  *
  * A span is emitted ONLY once the watermark proves no admissible
  * event can still merge into it (`watermark > end + gap`): a split
  * observed on arrival keeps BOTH sides in state — the earlier side
  * may still be extended by an out-of-order event with
  * `ts ∈ [watermark, end + gap]`, which any positive lateness
  * tolerance admits. Emitting it eagerly would fragment the session
  * into overlapping rows and break the exactly-once contract; holding
  * it costs one list entry until the single per-key timer (armed at
  * the EARLIEST span's expiry) fires.
  */
object SessionTracker {

  final case class Ev(ts: Timestamp, user_id: Long, value: Double)
  final case class SessAgg(startMs: Long, endMs: Long, n: Long, total: Double)
  final case class Spans(spans: Seq[SessAgg])
  final case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, total_value: Double)

  final class Processor(gapMs: Long) extends StatefulProcessor[Long, Ev, Session] {
    @transient private var sess: ValueState[Spans] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[Spans]("spans", Encoders.product[Spans], TTLConfig.NONE)

    private def toSession(key: Long, a: SessAgg): Session =
      Session(key, new Timestamp(a.startMs), new Timestamp(a.endMs), a.n, a.total)

    private def earliestExpiry(spans: Seq[SessAgg]): Long =
      spans.map(_.endMs).min + gapMs

    /** Emit every span the watermark has sealed, persist the rest, and
      * keep exactly one armed timer at the earliest live expiry. */
    private def sweep(
        key: Long, prev: Seq[SessAgg], merged: Seq[SessAgg], wmMs: Long): Iterator[Session] = {
      // strict '>': an event with ts == end+gap still merges, and the
      // runtime only drops rows strictly older than the watermark
      val (ripe, live) = merged.partition(a => wmMs > a.endMs + gapMs)
      val prevExpiry = if (prev.nonEmpty) Some(earliestExpiry(prev)) else None
      val liveExpiry = if (live.nonEmpty) Some(earliestExpiry(live)) else None
      if (prevExpiry != liveExpiry) {
        prevExpiry.foreach(getHandle.deleteTimer)
        liveExpiry.foreach(getHandle.registerTimer)
      }
      if (live.nonEmpty) sess.update(Spans(live)) else sess.clear()
      ripe.sortBy(_.startMs).iterator.map(toSession(key, _))
    }

    override def handleInputRows(
        key: Long, rows: Iterator[Ev], timers: TimerValues): Iterator[Session] = {
      val prev = if (sess.exists()) sess.get().spans else Seq.empty
      // Interval sweep-merge: stored spans and each arrival are spans;
      // spans whose silence is within `gap` coalesce. The merge works
      // on BOTH sides — a backfill delivering both sides of a gap in
      // one batch yields two spans, an admissible out-of-order event
      // more than `gap` EARLIER than every stored span forms its own —
      // and an out-of-order event can even bridge two stored spans
      // back into one.
      val items = (prev ++ rows.map(e => SessAgg(e.ts.getTime, e.ts.getTime, 1L, e.value)))
        .sortBy(a => (a.startMs, a.endMs))
      val merged = items.foldLeft(List.empty[SessAgg]) {
        case (Nil, it) => it :: Nil
        case (cur :: done, it) =>
          if (it.startMs <= cur.endMs + gapMs)
            SessAgg(cur.startMs, math.max(cur.endMs, it.endMs),
              cur.n + it.n, cur.total + it.total) :: done
          else it :: cur :: done
      }.reverse
      sweep(key, prev, merged, timers.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(
        key: Long, timers: TimerValues, timer: ExpiredTimerInfo): Iterator[Session] = {
      if (!sess.exists()) return Iterator.empty
      val spans = sess.get().spans
      // the timer fires once the watermark passes its expiry; seal with
      // whichever is further along (a stale timer for an extended span
      // seals nothing and the next timer is re-armed by the sweep)
      val wm = math.max(timers.getCurrentWatermarkInMs(), timer.getExpiryTimeInMs() + 1)
      sweep(key, spans, spans, wm)
    }
  }

  /** Wire session tracking onto a streaming Dataset[Ev]. `gapSec` is the
    * inactivity gap that closes a session; `lateSec` the watermark's
    * lateness tolerance (independent knobs — lateness delays closure,
    * the gap defines it). */
  def sessions(
      events: Dataset[Ev],
      gapSec: Long = 1800L,
      lateSec: Long = 60L,
  ): Dataset[Session] = {
    implicit val sessEnc = Encoders.product[Session]
    implicit val longEnc = Encoders.scalaLong
    events
      .withWatermark("ts", s"$lateSec seconds")
      .groupByKey(_.user_id)
      .transformWithState(new Processor(gapSec * 1000L),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
