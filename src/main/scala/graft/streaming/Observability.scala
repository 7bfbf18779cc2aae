package graft.streaming

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Declarative in-flight pipeline metrics via `Dataset.observe` — the
  * engine's answer to the reference's per-batch stat logging (its
  * processor counts and logs applied/skipped events per bulk round,
  * `src/processor.ts:342-360`): the metrics are aggregated INSIDE the
  * running job as rows stream past, so there is no second scan, no
  * extra shuffle, and no driver-side recount; observability costs one
  * accumulator update per row regardless of data size.
  *
  * Two consumption shapes, same metric definitions:
  *  - batch: an [[org.apache.spark.sql.Observation]] handle — `get`
  *    blocks until the action that consumed the frame finishes;
  *  - streaming: the named metrics surface per micro-batch in
  *    `StreamingQueryProgress.observedMetrics`, which is what a
  *    monitoring hook reads to alert on null-key spikes or thin
  *    batches without touching the data path.
  */
object Observability {

  /** The standard data-quality row: volume, key completeness, and an
    * event-time high-water mark (null keys upstream of a keyed merge
    * are the silent data-loss mode — they hash to one group or drop). */
  private def metricCols(keyCol: String, tsCol: String) = Seq(
    count(lit(1)).as("rows"),
    sum(when(col(keyCol).isNull, 1L).otherwise(0L)).as("null_keys"),
    max(col(tsCol)).as("max_event_ts"),
  )

  /** Batch form: attach metrics and a handle to read them after the
    * consuming action. */
  def observedBatch(df: DataFrame, obs: Observation, keyCol: String, tsCol: String): DataFrame = {
    val m = metricCols(keyCol, tsCol)
    df.observe(obs, m.head, m.tail: _*)
  }

  /** Streaming form: metrics appear under `name` in each progress
    * event's `observedMetrics`. */
  def observedStream(df: DataFrame, name: String, keyCol: String, tsCol: String): DataFrame = {
    val m = metricCols(keyCol, tsCol)
    df.observe(name, m.head, m.tail: _*)
  }
}
