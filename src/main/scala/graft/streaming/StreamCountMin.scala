package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.CountMin

/** Live Count-Min sketch maintenance — the streaming twin of the batch
  * `agg_countmin_audit` counters: as events flow in, the 256 (depth 4 ×
  * width 64) counters accumulate, and any moment's point query
  * `min_d counter[d, h_d(u)]` answers "roughly how many events has
  * user u produced so far" without per-user state.
  *
  * Where every other monitor here needed a custom StatefulProcessor
  * (ordered recursions, timers, sealed horizons), the CM sketch is a
  * pure COMMUTATIVE MONOID — counter updates are order-free integer
  * sums — so the Spark-first shape is the built-in streaming
  * aggregation, nothing custom: explode each event into its 4 (d,
  * cell) coordinates, `groupBy(d, cell).count` in update mode. The
  * runtime provides exactly-once counter state (checkpointed with the
  * offsets — a restart resumes the same integers, StreamCountMinSpec
  * pins it), map-side partial aggregation (the sketch-merge monoid the
  * batch audit documents), and update-mode emission of only the
  * touched cells per trigger.
  *
  * Exactness: integer arithmetic end to end over [[CountMin]]'s shared
  * hash family — a drained stream's counter table equals the batch
  * counters over the same events bit-for-bit, so streaming estimates
  * equal `agg_countmin_audit`'s n_est column exactly.
  *
  * Scale shape: state is the 256-cell table regardless of traffic or
  * user cardinality (the entire point of sketching the stream);
  * exchanges hash on (d, cell) — 256 keys — with map-side combine
  * taking the per-partition heavy lifting. No TTL, no watermark: the
  * sketch is a running total by definition.
  */
object StreamCountMin {

  /** Streaming (d, cell, cnt) counter table over a stream with a
    * `user_id` column. Write with `outputMode("update")`: each trigger
    * re-emits only the cells it touched, latest row per (d, cell) IS
    * the counter. */
  def counters(events: DataFrame): DataFrame = {
    val coords = array((0 until CountMin.depth).map { d =>
      struct(lit(d).as("d"), CountMin.idxCol(d, col("user_id")).as("cell"))
    }: _*)
    events
      .select(explode(coords).as("dc"))
      .select(col("dc.d").as("d"), col("dc.cell").as("cell"))
      .groupBy(col("d"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Batch form of [[counters]] — the same plan over a static frame
    * (what the drained stream must equal). */
  def batchCounters(events: DataFrame): DataFrame = counters(events)
}
