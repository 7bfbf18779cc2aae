package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous exact-dedup of a document stream — the streaming twin of
  * `DedupQueries.exact` for an ingestion pipeline that must drop
  * near-real-time duplicates before they reach the corpus.
  *
  * State discipline at scale: a plain `dropDuplicates` keeps every key
  * ever seen — unbounded state, the same reason the CDC tail keeps doc
  * state in a mergeable table instead of the state store.
  * `dropDuplicatesWithinWatermark` bounds state to the watermark
  * horizon: duplicates arriving within `horizon` of each other collapse
  * (the crawl/recrawl window where streaming dups actually occur);
  * anything older is the batch dedup pass's job. State size is
  * O(docs per horizon), not O(corpus).
  */
object StreamDedup {

  /** Dedup on content hash. `docs` must be a streaming DataFrame with
    * an event-time `ts` timestamp column and a `text` column; emits the
    * first arrival of each distinct content hash per horizon. */
  def dedupedByContent(docs: DataFrame, horizon: String = "10 minutes"): DataFrame =
    docs
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("content_hash")
}
