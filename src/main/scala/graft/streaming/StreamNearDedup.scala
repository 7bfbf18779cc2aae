package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous NEAR-dedup of a document stream — the streaming twin of
  * `DedupQueries.simhashPairs`, for an ingestion pipeline that must
  * drop crawl/recrawl near-duplicates (boilerplate swaps, timestamp
  * edits) before they reach the corpus, where exact content hashing
  * (`StreamDedup`) sees two different documents.
  *
  * Dataflow mirrors the batch operator exactly: a 60-bit SimHash
  * fingerprint per document ([[simhash60]] is bit-identical to the
  * batch SQL fingerprint), LSH-bucketed by the fingerprint's 16-bit
  * prefix, with exact Hamming distance deciding within the bucket.
  * The bucket is the `flatMapGroupsWithState` key, so a micro-batch
  * only ever compares against its own bucket's state — the same
  * "bucket-bounded, never all-pairs" discipline as every batch
  * near-dup variant.
  *
  * State discipline at scale: per-bucket state holds only CANONICAL
  * fingerprints seen within the watermark horizon. Entries are evicted
  * once the watermark passes `ts + horizon` (they can no longer match
  * any admissible arrival), and idle buckets clear themselves via
  * event-time timeout — state is O(canonical docs per horizon), spread
  * across 2^16 buckets, not O(corpus). Anything older is the batch
  * dedup pass's job, exactly as with the exact-dedup stream.
  */
object StreamNearDedup {

  final case class Doc(ts: Timestamp, doc_id: Long, text: String)

  /** Fingerprinted document riding the stream between map and state. */
  final case class FpDoc(ts: Timestamp, doc_id: Long, fp: Long)

  /** One canonical fingerprint remembered by a bucket. */
  final case class FpEntry(fp: Long, doc_id: Long, tsMs: Long)
  final case class BucketState(entries: Seq[FpEntry])

  /** Per-document decision: every arrival gets a row (a decision table
    * that covers the whole stream composes downstream either way);
    * `dup_of` is the matched canonical's id, or the doc's own id when
    * it is itself canonical. */
  final case class Decision(
      ts: Timestamp, doc_id: Long, simhash: Long, is_dup: Boolean, dup_of: Long)

  /** 60-bit SimHash, bit-identical to the batch fingerprint SQL
    * (`DedupQueries.fingerprints`): one MD5 per word OCCURRENCE (not
    * distinct words — repeated words vote repeatedly, like the batch
    * explode), first 15 hex chars as a 60-bit integer, per-bit majority
    * votes with a strict >0 threshold. */
  def simhash60(text: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](60)
    // limit -1: keep trailing empty strings, like Spark SQL's
    // split(text, ' ') — Java's default split would drop them and
    // break the bit-identical contract on trailing whitespace
    text.split(" ", -1).foreach { w =>
      val d = md.digest(w.getBytes("UTF-8"))
      md.reset()
      // first 15 hex chars = high 60 bits of the first 7.5 bytes
      var hl = 0L
      var i = 0
      while (i < 7) { hl = (hl << 8) | (d(i) & 0xffL); i += 1 }
      hl = (hl << 4) | ((d(7) & 0xf0L) >> 4)
      var b = 0
      while (b < 60) {
        if (((hl >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    (0 until 60).foldLeft(0L)((acc, b) => if (votes(b) > 0) acc | (1L << b) else acc)
  }

  /** The LSH state-key bucket: the fingerprint's top prefix bits, same
    * derivation as the batch op's `prefix16`, width from the one LSH
    * knob (graft.ops.Lsh — default 16 of 60, so `fp >>> 44` unset). */
  def prefix16(fp: Long): Long =
    fp >>> (60 - graft.ops.Lsh.prefixBits(16, 60))

  private def update(maxHamming: Int, horizonMs: Long)(
      bucket: Long,
      docs: Iterator[FpDoc],
      state: GroupState[BucketState],
  ): Iterator[Decision] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val wm = state.getCurrentWatermarkMs()
    // evict entries no admissible (post-watermark) arrival can match
    var entries = state.getOption.map(_.entries.toList).getOrElse(Nil)
      .filter(e => e.tsMs + horizonMs >= wm)
    val out = Vector.newBuilder[Decision]
    // event-time order within the batch so the earliest arrival of a
    // near-dup set becomes the canonical deterministically
    docs.toSeq.sortBy(d => (d.ts.getTime, d.doc_id)).foreach { d =>
      val tsMs = d.ts.getTime
      val matches = entries.filter(e =>
        math.abs(tsMs - e.tsMs) <= horizonMs &&
          java.lang.Long.bitCount(e.fp ^ d.fp) <= maxHamming)
      if (matches.nonEmpty) {
        val c = matches.minBy(e => (java.lang.Long.bitCount(e.fp ^ d.fp), e.doc_id))
        out += Decision(d.ts, d.doc_id, d.fp, is_dup = true, dup_of = c.doc_id)
      } else {
        out += Decision(d.ts, d.doc_id, d.fp, is_dup = false, dup_of = d.doc_id)
        entries = FpEntry(d.fp, d.doc_id, tsMs) :: entries
      }
    }
    if (entries.nonEmpty) {
      state.update(BucketState(entries))
      // the bucket is dead once the watermark passes its newest
      // canonical + horizon; timeout must sit strictly past the
      // current watermark
      state.setTimeoutTimestamp(math.max(entries.map(_.tsMs).max + horizonMs, wm + 1))
    } else state.remove()
    out.result().iterator
  }

  /** Wire the near-dedup decisions onto a streaming Dataset[Doc]. */
  def decisions(
      docs: Dataset[Doc],
      horizonSec: Long = 600L,
      maxHamming: Int = 12,
  ): Dataset[Decision] = {
    implicit val fpEnc = Encoders.product[FpDoc]
    implicit val decEnc = Encoders.product[Decision]
    implicit val stateEnc = Encoders.product[BucketState]
    implicit val longEnc = Encoders.scalaLong
    docs
      .map(d => FpDoc(d.ts, d.doc_id, simhash60(d.text)))
      .withWatermark("ts", s"$horizonSec seconds")
      .groupByKey(d => prefix16(d.fp))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(maxHamming, horizonSec * 1000L))
  }
}
