package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming grid resampling with forward fill — the on-line twin of
  * `events_resample_hourly`: per user, one cell per grid hour, the
  * last observation carried across gaps, each cell emitted EXACTLY
  * ONCE, exactly when the watermark seals its hour (an hour h is
  * sealed once `watermark >= (h+1)*3600s` — no admissible event can
  * land in it any more, because rows older than the watermark are
  * dropped before the operator sees them).
  *
  * Grid contract (matches the batch twin): cells span the user's own
  * [first observed hour, latest observed hour]. Hours sealed BEYOND
  * the user's latest observation stay unemitted until a later
  * observation extends the span — then the intervening gap cells
  * backfill in hour order, values carried forward. So on any sealed
  * horizon the emitted staircase equals the batch query's grid rows
  * restricted to that horizon (spec-pinned).
  *
  * State discipline at scale: one row per ACTIVE user holding the
  * carry value, the last emitted hour, and the open (unsealed or
  * unsealable) per-hour last-observations — O(open hours) per user,
  * bounded by the watermark horizon plus the user's own silence, not
  * O(events). One armed event-time timer per user with pending
  * sealed-but-blocked cells (the SessionTracker single-timer
  * discipline) lets gap cells flow while the user is silent — the
  * watermark advances on OTHER users' traffic and the timer path
  * emits the fills.
  *
  * The in-hour pick is the batch twin's exactly: the observation with
  * max (sec-in-hour, event_id) packed into one long.
  */
object StreamResample {

  final case class Ev(ts: Timestamp, user_id: Long, event_id: Long, value: Double)
  /** Per-hour best (packed-key max) observation still open. */
  final case class HourObs(hr: Long, packed: Long, value: Double)
  final case class ResampleState(lastEmittedHr: Long, lastValue: Double, open: Seq[HourObs])
  final case class Cell(user_id: Long, hr: Long, value: Double, observed: Boolean)

  private val HourMs = 3600000L

  final class Processor extends StatefulProcessor[Long, Ev, Cell] {
    @transient private var st: ValueState[ResampleState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[ResampleState](
        "resample", Encoders.product[ResampleState], TTLConfig.NONE)

    /** Highest hour sealed by this watermark (every hour <= it is
      * complete): wm >= (h+1)*3600s  <=>  h <= wm/3600s - 1. */
    private def sealedHr(wmMs: Long): Long = wmMs / HourMs - 1

    /** THE timer formula — the single source for arming, re-deriving
      * and deleting (any drift between arm and re-derive would orphan
      * real timers): while blocked cells remain, one timer at the end
      * of the NEXT cell's hour so fills flow even if this user goes
      * silent while the watermark advances. */
    private def timerFor(state: ResampleState): Option[Long] =
      if (state.open.nonEmpty) Some((state.lastEmittedHr + 2) * HourMs) else None

    /** Emit every sealed cell up to the user's latest observation,
      * persist the rest, keep one timer while blocked cells remain. */
    private def sweep(key: Long, prevTimerAt: Option[Long],
        state: ResampleState, wmMs: Long): Iterator[Cell] = {
      val maxObsHr = if (state.open.isEmpty) state.lastEmittedHr else state.open.map(_.hr).max
      val emitTo = math.min(maxObsHr, sealedHr(wmMs))
      val obs = state.open.map(o => o.hr -> o).toMap
      val cells = Vector.newBuilder[Cell]
      var hr = state.lastEmittedHr + 1
      var carry = state.lastValue
      while (hr <= emitTo) {
        obs.get(hr) match {
          case Some(o) => carry = o.value; cells += Cell(key, hr, carry, observed = true)
          case None    => cells += Cell(key, hr, carry, observed = false)
        }
        hr += 1
      }
      val live = state.open.filter(_.hr > emitTo)
      val next = ResampleState(emitTo.max(state.lastEmittedHr), carry, live)
      val pendingTimer = timerFor(next)
      if (prevTimerAt != pendingTimer) {
        prevTimerAt.foreach(getHandle.deleteTimer)
        pendingTimer.foreach(getHandle.registerTimer)
      }
      st.update(next)
      cells.result().iterator
    }

    override def handleInputRows(
        key: Long, rows: Iterator[Ev], timers: TimerValues): Iterator[Cell] = {
      val existed = st.exists()
      val prev =
        if (existed) st.get()
        else ResampleState(Long.MinValue, Double.NaN, Seq.empty)
      // fold arrivals straight into the per-hour maxima so batch memory
      // is O(distinct hours), never O(events) for a hot key
      val acc = scala.collection.mutable.HashMap.empty[Long, HourObs]
      def keepMax(o: HourObs): Unit = acc.get(o.hr) match {
        case Some(p) if p.packed >= o.packed => ()
        case _                               => acc(o.hr) = o
      }
      prev.open.foreach(keepMax)
      var sawRows = false
      rows.foreach { e =>
        sawRows = true
        val sec = e.ts.getTime / 1000L
        keepMax(HourObs(sec / 3600L, (sec % 3600L) * 10000000000L + e.event_id, e.value))
      }
      if (!sawRows && !existed) return Iterator.empty
      val merged = acc.values.toSeq.sortBy(_.hr)
      // The grid starts at the user's first observed hour — and an
      // admissible out-of-order arrival may EXTEND it downward, because
      // the first event's own hour need not be sealed yet (the
      // watermark lags maxEventTime by lateSec). Lowering is always
      // safe: emitting ANY cell implies the grid-start hour was sealed,
      // after which an event in-or-below it is behind the watermark and
      // dropped before the operator — so an arrival at or below
      // lastEmittedHr can only happen while NOTHING has been emitted.
      val lastEmitted =
        if (merged.isEmpty) prev.lastEmittedHr
        else if (prev.lastEmittedHr == Long.MinValue) merged.map(_.hr).min - 1
        else math.min(prev.lastEmittedHr, merged.map(_.hr).min - 1)
      sweep(key, if (existed) timerFor(prev) else None,
        ResampleState(lastEmitted, prev.lastValue, merged),
        timers.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(
        key: Long, timers: TimerValues, timer: ExpiredTimerInfo): Iterator[Cell] = {
      if (!st.exists()) return Iterator.empty
      val state = st.get()
      // the timer fires once the watermark passes its expiry; sweep
      // with whichever is further along (stale timers seal nothing and
      // the sweep re-arms the next one)
      val wm = math.max(timers.getCurrentWatermarkInMs(), timer.getExpiryTimeInMs())
      sweep(key, Some(timer.getExpiryTimeInMs()), state, wm)
    }
  }

  /** Wire hourly resampling onto a streaming Dataset[Ev]; `lateSec` is
    * the watermark lateness tolerance (it delays sealing, never the
    * grid definition).
    *
    * Preconditions/caveats:
    *  - `event_id < 1e10` (the batch twin's fixture contract): the
    *    in-hour tiebreak packs (sec-in-hour, event_id) into one Long;
    *    larger ids would corrupt the ordering.
    *  - State persists for every user ever seen (the carry value is
    *    what lets a returning user's silence forward-fill, exactly as
    *    the batch grid spans [first, last]) — for unbounded key
    *    domains where that span semantics can be relaxed, front the
    *    stream with an idle-horizon filter or clear state on a
    *    deployment-chosen TTL (the funnelStatesTtl pattern). */
  def cells(events: Dataset[Ev], lateSec: Long = 60L): Dataset[Cell] = {
    implicit val cellEnc = Encoders.product[Cell]
    implicit val longEnc = Encoders.scalaLong
    events
      .withWatermark("ts", s"$lateSec seconds")
      .groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.EventTime(), OutputMode.Append())
  }
}
