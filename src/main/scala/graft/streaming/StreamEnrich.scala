package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static enrichment join — the streaming form of the
  * reference's per-event state resolution (its tail phase joins each
  * change event against sink/source state, `src/processor.ts:214-258`)
  * applied to a dimension that does not change per event: attach
  * customer/document attributes to a live event stream.
  *
  * Scale shape: a stream-static join in Spark is STATELESS — no
  * watermark, no state store; each micro-batch plans a fresh join
  * against the static side. With the dimension broadcast (small dims)
  * the stream side never shuffles: per-batch cost is one scan of the
  * batch + a hash probe. A large dimension falls back to a shuffled
  * hash join per batch — then pre-bucketing the dimension on the join
  * key is what keeps the per-batch cost at one stream-side exchange.
  */
object StreamEnrich {

  /** Left-enrich a streaming frame with a static dimension on `key`;
    * events with no dimension row survive with nulls (enrichment must
    * never drop events — the dim may simply lag the stream). */
  def enriched(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")
}
