package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Keyed-state streaming with `flatMapGroupsWithState` (SURVEY.md §2.6
  * "stateful streaming ops"): running per-key counters kept in Spark's
  * state store across micro-batches.
  *
  * The CDC tail deliberately does NOT use this for document state —
  * its key space is unbounded (every `_id` ever seen), which makes the
  * state store the memory bottleneck at 100 TB; the engine keeps doc
  * state in a mergeable table instead (DESIGN.md). This operator is for
  * the cases keyed state IS right: bounded key spaces (users, shards,
  * op classes) with per-key running aggregates.
  */
object StatefulCounts {

  final case class Event(key: String, value: Double)
  final case class KeyStats(key: String, n: Long, total: Double)

  def update(
      key: String,
      events: Iterator[Event],
      state: GroupState[KeyStats],
  ): Iterator[KeyStats] = {
    val prev = state.getOption.getOrElse(KeyStats(key, 0L, 0.0))
    val evs = events.toSeq
    val next = KeyStats(key, prev.n + evs.size, prev.total + evs.map(_.value).sum)
    state.update(next)
    Iterator.single(next)
  }

  /** Wire the stateful operator onto a streaming Dataset[Event]. */
  def runningStats(events: Dataset[Event]): Dataset[KeyStats] = {
    implicit val statsEnc = Encoders.product[KeyStats]
    implicit val strEnc = Encoders.STRING
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(update)
  }
}
