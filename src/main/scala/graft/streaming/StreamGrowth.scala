package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Live weekly growth accounting — the streaming twin of the batch
  * `events_growth_accounting` query: as events flow in, each user's
  * active-week set accumulates, and WHEN THE WATERMARK SEALS A WEEK the
  * per-user stage verdicts for that week (new / retained / resurrected,
  * plus churned for users who went quiet) are emitted via event-time
  * timers — so the WAU decomposition for week w is published the moment
  * w can no longer change, not at the next offline report.
  *
  * Two-layer shape:
  *
  *  1. [[stages]] — the stateful per-user layer (`transformWithState`,
  *     TimeMode.EventTime). State per user: first active week + active
  *     weeks (one long each — calendar-bounded: a decade of weekly
  *     activity is ~520 longs; prunable below watermark−2 in a
  *     deployment, kept whole here for auditability). Each newly-seen
  *     active week w registers timers at the seal instants of w (its
  *     classification) and w+1 (its churn check). All of week w's
  *     verdicts — classifications AND churn — fire in the ONE
  *     micro-batch whose watermark crosses (w+1)·WEEK, which is what
  *     makes layer 2 stateless.
  *  2. [[weeklyOf]] — the per-week reduction, run inside `foreachBatch`
  *     (every stage row for a given week arrives in a single
  *     micro-batch, so a plain batch aggregation per trigger IS the
  *     complete weekly row; writing it keyed by batchId makes the
  *     at-least-once replay after a restart idempotent — the standard
  *     foreachBatch discipline).
  *
  * Exactness: week = floor(epoch_seconds / 604800) — the batch query's
  * `sec div 604800`; classification reads only weeks ≤ w, which are
  * final once w seals (later events for them are beyond the watermark);
  * churn at week w ≡ active at w−1 ∧ inactive at w — the batch query's
  * `next > week+1` gap condition; quick_ratio reuses the identical
  * Registry.rnd Column arithmetic. StreamGrowthSpec pins sealed-week
  * rows ≡ the batch rows bit-for-bit through a ≥3-micro-batch stream
  * including a mid-week checkpoint restart.
  *
  * Scale shape: one exchange on user_id (the same single exchange the
  * batch twin's windows ride); timer and state volume are O(users ×
  * active weeks), independent of event volume; the weekly reduction
  * sees only verdict rows (users-per-week, not events).
  *
  * Week-set contract (unified in round 15, r14 verdict #8): a weekly
  * row exists for every week with ANY verdict — activity OR churn — so
  * a week where every remaining user went quiet is a real report row
  * (wau=0, n_churned>0) on BOTH sides; the batch twin's full-outer
  * weekly⟗churn join emits it too, and the spec hashes the equality on
  * the full week set.
  */
object StreamGrowth {

  final case class Ev(user_id: Long, ts: java.sql.Timestamp)
  final case class UserWeeks(firstWeek: Long, weeks: Array[Long])
  final case class StageRow(week: Long, user_id: Long, stage: String)

  private val WeekSec = 604800L
  private val WeekMs = WeekSec * 1000L

  private[streaming] def weekOf(ev: Ev): Long =
    Math.floorDiv(Math.floorDiv(ev.ts.getTime, 1000L), WeekSec)

  final class Processor extends StatefulProcessor[Long, Ev, StageRow] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[UserWeeks] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[UserWeeks]("user_weeks",
        Encoders.product[UserWeeks], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[Ev], timers: TimerValues): Iterator[StageRow] = {
      val cur = if (st.exists()) st.get() else UserWeeks(Long.MaxValue, Array.empty)
      var weeks = cur.weeks.toSet
      var first = cur.firstWeek
      rows.foreach { ev =>
        val w = weekOf(ev)
        if (!weeks(w)) {
          weeks += w
          // seal of w => classify w; seal of w+1 => churn check for w+1.
          // Same-instant registrations collapse (timers key on their
          // timestamp), so an active w+1 never double-fires.
          getHandle.registerTimer((w + 1) * WeekMs)
          getHandle.registerTimer((w + 2) * WeekMs)
        }
        if (w < first) first = w
      }
      st.update(UserWeeks(first, weeks.toArray.sorted))
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: Long, timers: TimerValues, expired: ExpiredTimerInfo): Iterator[StageRow] = {
      val sealedW = expired.getExpiryTimeInMs / WeekMs - 1
      if (!st.exists()) Iterator.empty
      else {
        val u = st.get()
        val active = java.util.Arrays.binarySearch(u.weeks, sealedW) >= 0
        val prevActive = java.util.Arrays.binarySearch(u.weeks, sealedW - 1) >= 0
        if (active)
          Iterator.single(StageRow(sealedW, key,
            if (sealedW == u.firstWeek) "new"
            else if (prevActive) "retained"
            else "resurrected"))
        else if (prevActive)
          Iterator.single(StageRow(sealedW, key, "churned"))
        else Iterator.empty
      }
    }
  }

  /** The per-user stage stream: one verdict row per (user, sealed week)
    * — plus a churn row at the first silent week after activity.
    * `delay` is the watermark lateness bound on `ts`. */
  def stages(events: Dataset[Ev], delay: String = "1 second"): Dataset[StageRow] = {
    implicit val outEnc = Encoders.product[StageRow]
    implicit val keyEnc = Encoders.scalaLong
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.EventTime(), OutputMode.Append())
  }

  /** The weekly decomposition of a micro-batch of stage rows — the
    * batch query's output row, column for column (counts are exact
    * longs; quick_ratio is the identical Registry.rnd expression). Run
    * inside foreachBatch; every week's rows arrive in one batch. */
  def weeklyOf(stageRows: DataFrame): DataFrame =
    stageRows.groupBy(col("week"))
      .agg(
        sum(when(col("stage") =!= "churned", 1L).otherwise(0L)).as("wau"),
        sum(when(col("stage") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("stage") === "retained", 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("stage") === "resurrected", 1L).otherwise(0L)).as("n_resurrected"),
        sum(when(col("stage") === "churned", 1L).otherwise(0L)).as("n_churned"))
      .withColumn("quick_ratio",
        when(col("n_churned") > 0, graft.ops.Registry.rnd(
          (col("n_new") + col("n_resurrected")).cast("double") / col("n_churned"), 4)))
      .select(col("week"), col("wau"), col("n_new"), col("n_retained"),
        col("n_resurrected"), col("n_churned"), col("quick_ratio"))
}
