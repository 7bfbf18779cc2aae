package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** In-flight per-source admission quota — the streaming twin of
  * `pipeline_source_cap` for an ingestion pipeline that must stop a
  * single host flooding the corpus BEFORE documents land: the batch
  * query caps retroactively by quality rank; this caps at ingest by
  * arrival order (the only order a stream has), admitting each
  * source's first `cap` documents and dropping the rest.
  *
  * State discipline at scale: one Long counter per source — the key
  * space is hosts/domains, which is bounded and tiny next to the
  * corpus (the [[StatefulCounts]] doctrine: keyed state only for
  * bounded key spaces). No timeout: a quota is a property of the whole
  * ingest run, not a window. Within a micro-batch the group's rows are
  * ordered by `doc_id` so admission is deterministic under Spark's
  * unordered group iterators (and replay-stable, which makes the
  * operator testable batch-vs-stream: first-cap by doc_id equals the
  * batch `row_number() over (partition by source order by doc_id)`
  * rank filter).
  */
object StreamSourceCap {

  final case class Doc(doc_id: Long, source: String)

  def admit(cap: Int)(
      source: String,
      docs: Iterator[Doc],
      state: GroupState[Long],
  ): Iterator[Doc] = {
    val seen = state.getOption.getOrElse(0L)
    val batch = docs.toSeq.sortBy(_.doc_id)
    // Long-domain arithmetic: `cap - seen.toInt` would wrap once a
    // source has seen >2^31 docs and re-open an exhausted quota.
    val room = math.min(math.max(0L, cap.toLong - seen), Int.MaxValue.toLong).toInt
    val admitted = batch.take(room)
    state.update(seen + batch.size)
    admitted.iterator
  }

  /** Wire the quota onto a streaming frame with `doc_id` and `source`
    * columns; emits only the admitted documents. */
  def admitted(docs: DataFrame, cap: Int): Dataset[Doc] = {
    implicit val docEnc = Encoders.product[Doc]
    implicit val strEnc = Encoders.STRING
    implicit val longEnc = Encoders.scalaLong
    docs.select("doc_id", "source").as[Doc]
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(admit(cap))
  }
}
