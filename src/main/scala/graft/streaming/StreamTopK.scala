package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters — the on-line twin of the batch
  * `agg_approx_topk` sketch query: SpaceSaving summaries (Metwally,
  * Agrawal, El Abbadi 2005) maintained in keyed state across
  * micro-batches.
  *
  * Sharding: items key their state by `hash(item) mod nShards`, so
  *  - state is DISTRIBUTED — no single hot state key serializes the
  *    stream the way a global "one summary" key would at 100 TB;
  *  - each distinct item is tracked by exactly ONE shard, so the
  *    global top-k is the plain union of shard summaries ranked by
  *    estimate — no cross-shard merge logic, no double counting.
  *
  * Per-shard state is a bounded Vector of at most `capacity` slots
  * (item, est, err) plus the shard's processed total — O(nShards ×
  * capacity) state for the whole stream regardless of item cardinality
  * (the reason SpaceSaving exists; an exact per-item counter state
  * grows with the key space, the StatefulCounts scaladoc's 100 TB
  * warning). Standard guarantees hold per shard:
  *   est − err ≤ true ≤ est,   err ≤ shardTotal / capacity,
  * and any item with true > shardTotal/capacity is guaranteed tracked.
  * With capacity ≥ distinct items per shard the summary is EXACT —
  * the regime StreamTopKSpec pins against the batch GROUP BY.
  *
  * Batch-increment fold: the micro-batch's items reduce to (item,
  * count) first (map-side, one pass over the iterator), then apply in
  * deterministic (count desc, item) order — tracked items add their
  * count; new items take an empty slot as (c, 0) or evict the minimum
  * slot as (min + c, min). Equivalent to item-at-a-time SpaceSaving
  * for the guarantee, deterministic given the batch content.
  */
object StreamTopK {

  final case class Item(item: String)
  final case class Slot(item: String, est: Long, err: Long)
  final case class ShardState(slots: Vector[Slot], total: Long)
  final case class ShardSummary(
      shard: Int, item: String, est: Long, err: Long, shard_total: Long)

  def shardOf(item: String, nShards: Int): Int =
    math.floorMod(item.hashCode, nShards)

  /** One SpaceSaving batch-fold over a shard's new arrivals. */
  private[streaming] def absorb(
      st: ShardState, batch: Map[String, Long], capacity: Int): ShardState = {
    val ordered = batch.toVector.sortBy { case (it, c) => (-c, it) }
    var slots = st.slots
    ordered.foreach { case (it, c) =>
      val i = slots.indexWhere(_.item == it)
      if (i >= 0) {
        val s = slots(i)
        slots = slots.updated(i, s.copy(est = s.est + c))
      } else if (slots.size < capacity) {
        slots = slots :+ Slot(it, c, 0L)
      } else {
        // evict the minimum estimate (ties: largest err, then item —
        // the slot with least evidence of being a true heavy hitter)
        val victim = slots.minBy(s => (s.est, -s.err, s.item))
        val j = slots.indexOf(victim)
        slots = slots.updated(j, Slot(it, victim.est + c, victim.est))
      }
    }
    ShardState(slots, st.total + batch.valuesIterator.sum)
  }

  private def update(capacity: Int)(
      shard: Int,
      items: Iterator[Item],
      state: GroupState[ShardState],
  ): Iterator[ShardSummary] = {
    val prev = state.getOption.getOrElse(ShardState(Vector.empty, 0L))
    val counts = items.foldLeft(Map.empty[String, Long]) { (m, it) =>
      m.updated(it.item, m.getOrElse(it.item, 0L) + 1L)
    }
    val next = absorb(prev, counts, capacity)
    state.update(next)
    next.slots.iterator.map(s =>
      ShardSummary(shard, s.item, s.est, s.err, next.total))
  }

  /** Wire onto a streaming Dataset[Item]: Update-mode per-shard
    * summaries re-emitted whenever a shard's state changes. The global
    * top-k over the latest snapshot is `ORDER BY est DESC LIMIT k` on
    * the sink table — exact w.r.t. the summaries because shards
    * partition the item space. */
  def summaries(
      items: Dataset[Item],
      nShards: Int,
      capacity: Int): Dataset[ShardSummary] = {
    implicit val sumEnc = Encoders.product[ShardSummary]
    implicit val stEnc = Encoders.product[ShardState]
    implicit val intEnc = Encoders.scalaInt
    items
      .groupByKey(it => shardOf(it.item, nShards))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        update(capacity))
  }
}
