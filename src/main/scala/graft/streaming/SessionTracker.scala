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
  * State discipline at scale: one ValueState row and one armed timer
  * per ACTIVE user (cleared on close) — state is O(concurrently active
  * users), not O(events) and not O(users ever seen). The state store is
  * RocksDB (transformWithState requires it), which is also the provider
  * a 100 TB deployment runs for state larger than executor heaps.
  */
object SessionTracker {

  final case class Ev(ts: Timestamp, user_id: Long, value: Double)
  final case class SessAgg(startMs: Long, endMs: Long, n: Long, total: Double)
  final case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, total_value: Double)

  final class Processor(gapMs: Long) extends StatefulProcessor[Long, Ev, Session] {
    @transient private var sess: ValueState[SessAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[SessAgg]("sess", Encoders.product[SessAgg], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[Ev], timers: TimerValues): Iterator[Session] = {
      val prev = if (sess.exists()) sess.get() else null
      // Interval sweep-merge: the stored session and each arrival are
      // spans; spans whose silence is within `gap` coalesce. Splits must
      // not depend on the watermark (other keys' traffic) having fired
      // the close timer, and they must work on BOTH sides — a backfill
      // delivering both sides of a gap in one batch yields two sessions,
      // and an admissible out-of-order event more than `gap` EARLIER
      // than the open session's start forms (and closes) its own
      // session rather than merging across the silence. Everything but
      // the latest span closes on the spot; only the latest can still
      // grow under the watermark.
      val items = (Option(prev).toList ++ rows.map(e =>
          SessAgg(e.ts.getTime, e.ts.getTime, 1L, e.value)))
        .sortBy(a => (a.startMs, a.endMs))
      val merged = items.foldLeft(List.empty[SessAgg]) {
        case (Nil, it) => it :: Nil
        case (cur :: done, it) =>
          if (it.startMs <= cur.endMs + gapMs)
            SessAgg(cur.startMs, math.max(cur.endMs, it.endMs),
              cur.n + it.n, cur.total + it.total) :: done
          else it :: cur :: done
      }.reverse
      val closed = merged.dropRight(1).map(a =>
        Session(key, new Timestamp(a.startMs), new Timestamp(a.endMs), a.n, a.total))
      merged.lastOption.foreach { agg =>
        // keep exactly one armed timer per key: re-arm at the (possibly
        // extended or re-opened) session end
        val newExpiry = agg.endMs + gapMs
        if (prev != null && prev.endMs + gapMs != newExpiry)
          getHandle.deleteTimer(prev.endMs + gapMs)
        if (prev == null || prev.endMs + gapMs != newExpiry)
          getHandle.registerTimer(newExpiry)
        sess.update(agg)
      }
      closed.iterator
    }

    override def handleExpiredTimer(
        key: Long, timers: TimerValues, timer: ExpiredTimerInfo): Iterator[Session] = {
      if (!sess.exists()) return Iterator.empty
      val a = sess.get()
      // a stale timer (session extended after arming) must not close
      // the live session early
      if (timer.getExpiryTimeInMs() < a.endMs + gapMs) return Iterator.empty
      sess.clear()
      Iterator.single(Session(key, new Timestamp(a.startMs), new Timestamp(a.endMs),
        a.n, a.total))
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
