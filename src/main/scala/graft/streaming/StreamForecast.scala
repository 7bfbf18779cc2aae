package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming one-step-ahead forecast monitor — the on-line twin of
  * `events_forecast_backtest`: per event type, every SEALED hour
  * emits its dense count together with the trailing-8-hour
  * exponentially-weighted forecast (weights 2^-k — 255·forecast is
  * an exact integer, the batch twin's arithmetic verbatim) and the
  * absolute errors of the WMA, naive (lag-1) and seasonal (lag-24)
  * predictors. The live form of "is this hour's arrival volume what
  * the model expected" — the input a paging threshold consumes.
  *
  * Dense grid contract: an hour h is sealed once watermark ≥
  * (h+1)·3600 s; EVERY sealed hour from the type's first observation
  * onward emits, including silent zero-count hours (a dead feed is
  * exactly what a volume monitor must surface). The one documented
  * divergence from the batch twin: the batch grid stops at the last
  * OBSERVED hour, the monitor keeps emitting zeros through trailing
  * silence — on any sealed horizon the streamed rows equal the batch
  * computation over the zero-extended span (spec-pinned).
  *
  * Forecast fields are None for the first 24 sealed hours (the batch
  * twin's warm-up: it evaluates only h ≥ mn + 24).
  *
  * State discipline at scale: one row per event type holding the
  * trailing ≤24 sealed counts (Longs), the last sealed hour, and the
  * open (unsealed) per-hour counts — O(24 + watermark horizon) per
  * key, never O(events); arrivals fold into per-hour counts as they
  * stream through the batch iterator. One armed event-time timer per
  * type keeps zero-count hours flowing while the type is silent (the
  * StreamResample timer discipline — the watermark advances on other
  * keys' traffic, the timer path emits the zeros).
  */
object StreamForecast {

  final case class Ev(ts: Timestamp, event_id: Long, event_type: String)
  final case class HourCount(hr: Long, n: Long)
  final case class ForecastState(lastSealedHr: Long, hist: Seq[Long], open: Seq[HourCount])
  final case class Fc(
      event_type: String, hr: Long, x: Long,
      forecast255: Option[Long], err_wma255: Option[Long],
      err_naive: Option[Long], err_seasonal: Option[Long])

  private val HourMs = 3600000L

  final class Processor extends StatefulProcessor[String, Ev, Fc] {
    @transient private var st: ValueState[ForecastState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[ForecastState](
        "forecast", Encoders.product[ForecastState], TTLConfig.NONE)

    private def sealedHr(wmMs: Long): Long = wmMs / HourMs - 1

    /** The monitor never retires: while the type has state, one timer
      * at the end of the next unsealed hour keeps silent-hour zeros
      * flowing. Single source for arm/re-derive/delete. */
    private def timerFor(state: ForecastState): Long =
      (state.lastSealedHr + 2) * HourMs

    private def sweep(key: String, prevTimerAt: Option[Long],
        state: ForecastState, wmMs: Long): Iterator[Fc] = {
      val emitTo = sealedHr(wmMs)
      val openByHr = state.open.map(c => c.hr -> c.n).toMap
      val out = Vector.newBuilder[Fc]
      var hist = state.hist.toVector
      var hr = state.lastSealedHr + 1
      while (hr <= emitTo) {
        val x = openByHr.getOrElse(hr, 0L)
        if (hist.length >= 24) {
          val f = (1 to 8).map(k => (1L << (8 - k)) * hist(hist.length - k)).sum
          out += Fc(key, hr, x, Some(f), Some(math.abs(x * 255L - f)),
            Some(math.abs(x - hist.last)),
            Some(math.abs(x - hist(hist.length - 24))))
        } else out += Fc(key, hr, x, None, None, None, None)
        hist = (hist :+ x).takeRight(24)
        hr += 1
      }
      val next = ForecastState(
        math.max(emitTo, state.lastSealedHr), hist,
        state.open.filter(_.hr > emitTo))
      val pendingTimer = timerFor(next)
      if (!prevTimerAt.contains(pendingTimer)) {
        prevTimerAt.foreach(getHandle.deleteTimer)
        getHandle.registerTimer(pendingTimer)
      }
      st.update(next)
      out.result().iterator
    }

    override def handleInputRows(
        key: String, rows: Iterator[Ev], timers: TimerValues): Iterator[Fc] = {
      val existed = st.exists()
      val prev =
        if (existed) st.get()
        else ForecastState(Long.MinValue, Seq.empty, Seq.empty)
      val acc = scala.collection.mutable.HashMap.empty[Long, Long]
      prev.open.foreach(c => acc(c.hr) = c.n)
      var sawRows = false
      rows.foreach { e =>
        sawRows = true
        val hr = e.ts.getTime / HourMs
        acc(hr) = acc.getOrElse(hr, 0L) + 1L
      }
      if (!sawRows && !existed) return Iterator.empty
      val merged = acc.toSeq.sortBy(_._1).map { case (h, n) => HourCount(h, n) }
      // series start = the type's first observed hour; an admissible
      // out-of-order arrival below it can only happen before anything
      // sealed (same argument as StreamResample's grid-start note)
      val lastSealed =
        if (merged.isEmpty) prev.lastSealedHr
        else if (prev.lastSealedHr == Long.MinValue) merged.map(_.hr).min - 1
        else math.min(prev.lastSealedHr, merged.map(_.hr).min - 1)
      sweep(key, if (existed) Some(timerFor(prev)) else None,
        ForecastState(lastSealed, prev.hist, merged),
        timers.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(
        key: String, timers: TimerValues, timer: ExpiredTimerInfo): Iterator[Fc] = {
      if (!st.exists()) return Iterator.empty
      val wm = math.max(timers.getCurrentWatermarkInMs(), timer.getExpiryTimeInMs())
      sweep(key, Some(timer.getExpiryTimeInMs()), st.get(), wm)
    }
  }

  /** Wire the forecast monitor onto a streaming Dataset[Ev]. */
  def scored(events: Dataset[Ev], lateSec: Long = 60L): Dataset[Fc] = {
    implicit val fcEnc = Encoders.product[Fc]
    implicit val strEnc = Encoders.STRING
    events
      .withWatermark("ts", s"$lateSec seconds")
      .groupByKey(_.event_type)
      .transformWithState(new Processor, TimeMode.EventTime(), OutputMode.Append())
  }
}
