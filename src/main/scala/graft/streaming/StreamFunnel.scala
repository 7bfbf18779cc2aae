package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental sequential-funnel maintenance — the streaming twin of
  * `events_funnel_steps` (per user: first click, first view at or
  * after it, first purchase within an hour of that view) for a
  * dashboard that must track conversion as events arrive instead of
  * re-scanning history per refresh.
  *
  * The per-batch transition is MIN-based, not sequence-based: each
  * micro-batch contributes `min(candidate)` for every step against
  * the state's current step times, which makes the fold exact for any
  * ts-ordered micro-batching (each step's global first-qualifying
  * time lands in the first batch that contains it — later batches
  * only carry later timestamps) and independent of intra-batch row
  * order — same-second ties inside one batch are resolved by the min,
  * exactly as the batch query's window-min semantics resolve them.
  *
  * State: three step times per user. [[funnelStates]] keeps every
  * user ever seen — the bounded-key-space keyed-state doctrine
  * ([[StatefulCounts]]), right when the user domain is bounded.
  * [[funnelStatesTtl]] is the unbounded-domain deployment shape: an
  * event-time timeout clears a user's state once the watermark passes
  * their last event plus a configurable idle horizon, so the store is
  * sized by RECENTLY ACTIVE users, not users ever seen — while any
  * user whose activity stays within the horizon folds identically to
  * the no-TTL form.
  */
object StreamFunnel {

  /** `ts_us` = event time in epoch MICROSECONDS (`unix_micros(ts)`) —
    * the fixture's native precision; second-truncated times would
    * diverge from the batch query's timestamp comparisons on
    * sub-second orderings. */
  final case class Ev(user_id: Long, ts_us: Long, event_type: String)

  /** Per-user funnel progress: step times in epoch microseconds, -1 =
    * not reached (Options don't survive the state encoder as
    * cleanly). */
  final case class FunnelState(user_id: Long, t1: Long, t2: Long, t3: Long)

  private def minPos(a: Long, b: Option[Long]): Long = (a, b) match {
    case (-1L, Some(v)) => v
    case (x, Some(v))   => math.min(x, v)
    case (x, None)      => x
  }

  /** The pure per-batch min-fold — the single definition of the funnel
    * transition, shared verbatim by the no-TTL and TTL paths. */
  private[streaming] def fold(
      user: Long, prevOpt: Option[FunnelState], b: Seq[Ev]): FunnelState = {
    val prev = prevOpt.getOrElse(FunnelState(user, -1L, -1L, -1L))
    val t1 = minPos(prev.t1,
      b.collect { case e if e.event_type == "click" => e.ts_us }.minOption)
    val t2 =
      if (t1 < 0) -1L
      else minPos(prev.t2,
        b.collect { case e if e.event_type == "view" && e.ts_us >= t1 => e.ts_us }.minOption)
    val hourUs = 3600L * 1000000L
    val t3 =
      if (t2 < 0) -1L
      else minPos(prev.t3,
        b.collect {
          case e if e.event_type == "purchase" && e.ts_us >= t2 && e.ts_us <= t2 + hourUs => e.ts_us
        }.minOption)
    FunnelState(user, t1, t2, t3)
  }

  def update(
      user: Long,
      evs: Iterator[Ev],
      state: GroupState[FunnelState],
  ): Iterator[FunnelState] = {
    val next = fold(user, state.getOption, evs.toSeq)
    state.update(next)
    Iterator.single(next)
  }

  /** Wire onto a streaming Dataset[Ev]; emits each user's updated
    * funnel state per micro-batch that touched the user. */
  def funnelStates(events: Dataset[Ev]): Dataset[FunnelState] = {
    implicit val stEnc = Encoders.product[FunnelState]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(update)
  }

  /** [[Ev]] with the event time surfaced as a Timestamp column so the
    * watermark (and therefore the event-time timeout) can attach. */
  final case class EvT(ts: java.sql.Timestamp, user_id: Long, ts_us: Long, event_type: String)

  /** TTL-path state: funnel progress plus the newest event time ever
    * seen for the user (ms). Carrying lastSeen makes the eviction
    * deadline MONOTONE — a micro-batch holding only late (older)
    * events for an already-seen user folds normally but can no longer
    * pull the timeout backward from the documented
    * 'last event + idle horizon'. */
  final case class FunnelStateTtl(
      user_id: Long, t1: Long, t2: Long, t3: Long, lastSeenMs: Long)

  private[streaming] def updateTtl(idleMs: Long)(
      user: Long,
      evs: Iterator[EvT],
      state: GroupState[FunnelStateTtl],
  ): Iterator[FunnelState] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val b = evs.toSeq
    val prev = state.getOption
    // identical min-fold as the no-TTL path — TTL only adds eviction
    val next = fold(user, prev.map(p => FunnelState(p.user_id, p.t1, p.t2, p.t3)),
      b.map(e => Ev(e.user_id, e.ts_us, e.event_type)))
    // dead once the watermark passes the user's newest-ever event + idle
    // horizon (clamped against the stored lastSeen so late-only batches
    // keep the deadline); the timeout must sit strictly past the
    // current watermark
    val lastSeenMs = math.max(prev.map(_.lastSeenMs).getOrElse(Long.MinValue),
      b.map(_.ts_us / 1000L).max)
    state.update(FunnelStateTtl(user, next.t1, next.t2, next.t3, lastSeenMs))
    state.setTimeoutTimestamp(math.max(lastSeenMs + idleMs, state.getCurrentWatermarkMs() + 1))
    Iterator.single(next)
  }

  /** TTL twin of [[funnelStates]] for unbounded user domains: state is
    * cleared once a user has been idle past `idleSec` of event time
    * (watermark-driven, so late events within `lateSec` still fold).
    * A cleared user re-entering starts a fresh funnel — the standard
    * windowed-attribution semantics a finite funnel window implies. */
  def funnelStatesTtl(
      events: Dataset[Ev],
      idleSec: Long = 86400L,
      lateSec: Long = 60L,
  ): Dataset[FunnelState] = {
    implicit val stEnc = Encoders.product[FunnelStateTtl]
    implicit val outEnc = Encoders.product[FunnelState]
    implicit val evtEnc = Encoders.product[EvT]
    implicit val longEnc = Encoders.scalaLong
    events
      .map(e => EvT(new java.sql.Timestamp(e.ts_us / 1000L), e.user_id, e.ts_us, e.event_type))
      .withWatermark("ts", s"$lateSec seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        updateTtl(idleSec * 1000L))
  }

  /** The batch query's output shape from a frame of final per-user
    * states: users reaching each step. */
  def funnelCounts(states: DataFrame): DataFrame =
    states.agg(
      sum(when(col("t1") >= 0, 1L).otherwise(0L)).as("u1"),
      sum(when(col("t2") >= 0, 1L).otherwise(0L)).as("u2"),
      sum(when(col("t3") >= 0, 1L).otherwise(0L)).as("u3"))
      .selectExpr(
        "stack(3, 1L, 'click', u1, 2L, 'click>view', u2, 3L, 'click>view>purchase', u3) AS (step_no, step, users)")
      .orderBy(col("step_no"))
}
