package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream inner join within an event-time interval — the
  * attribution shape (click joined to the view that preceded it within
  * the horizon).
  *
  * Both sides carry watermarks, so Spark bounds the join state: a
  * buffered left row can be dropped once the right watermark passes
  * `leftTs + horizon` and vice versa. Without the interval condition
  * the state store must hold BOTH streams forever — the unbounded-state
  * trap; with it, state is O(rows per horizon) per side, which is what
  * lets the join run indefinitely at ingest scale.
  */
object IntervalJoin {

  /** Join `left` and `right` on `key`, keeping pairs where the right
    * event happened in [left ts, left ts + horizon]. Column names on
    * the two sides must be disjoint except for `key`.
    *
    * `lateness` (how long out-of-order events are tolerated, i.e. the
    * watermark delay) is a separate knob from the join horizon —
    * per-side state is O(horizon + lateness), so a 30-day attribution
    * window with minutes of actual disorder should not pay a 30-day
    * lateness allowance. It defaults to the horizon for callers that
    * don't care. */
  def joinWithin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      horizon: String,
      lateness: Option[String] = None,
  ): DataFrame =
    joinImpl(left, right, key, leftTs, rightTs, horizon, lateness, "inner")

  /** Left-outer variant: every left event is emitted exactly once —
    * joined rows as matches arrive, unmatched rows with nulls once the
    * watermark proves no match can still come (right watermark past
    * `leftTs + horizon`). This is the "every impression gets a verdict"
    * attribution shape: the null rows ARE the negative results, and
    * they cost no extra state — the same horizon+lateness bound that
    * lets the inner join evict a buffered row is what triggers the
    * null emission here. */
  def joinWithinLeftOuter(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      horizon: String,
      lateness: Option[String] = None,
  ): DataFrame =
    joinImpl(left, right, key, leftTs, rightTs, horizon, lateness, "leftOuter")

  private def joinImpl(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      horizon: String,
      lateness: Option[String],
      joinType: String,
  ): DataFrame = {
    val delay = lateness.getOrElse(horizon)
    val l = left.withWatermark(leftTs, delay)
    val r = right.withWatermark(rightTs, delay)
    l.join(r,
      l(key) === r(key) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $horizon"),
      joinType)
      .drop(r(key))
  }
}
