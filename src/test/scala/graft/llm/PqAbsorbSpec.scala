package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Incremental PQ encode (r15 verdict #6): absorbing a landed batch
  * appends an O(batch) delta code segment — never re-encodes the
  * existing corpus — and the resulting code table is EXACTLY a full
  * re-encode's (codes are immutable under a frozen codebook).
  * Restart-zero-rebuild is preserved across the absorb, and the
  * sim_pq_topk query runs green over the multi-segment index.
  */
class PqAbsorbSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def codeSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("absorb ≡ full re-encode: exact code-set equality, zero full-encode jobs") {
    val tmp = java.nio.file.Files.createTempDirectory("pq-abs").toString
    val e = graft.ops.Tables.table(spark, dir, "embeddings")
    // the merged table is on disk from the start; the PQ codebook
    // freezes over it (the KnnGraphStore lifecycle contract: one
    // codebook per corpus snapshot — a retrain event is a rebuild)
    e.write.parquet(s"$tmp/embeddings.parquet")
    val old = e.filter(col("vec_id") % 5 =!= 0)
    val batch = e.filter(col("vec_id") % 5 === 0)
    SimilarityQueries.pqEncodeBaseFor(spark, tmp, old)
    val e0 = PqStore.encodeCount
    val a0 = PqStore.absorbCount
    val absorbed = codeSet(SimilarityQueries.pqAbsorb(spark, tmp, batch))
    assert(PqStore.absorbCount === a0 + 1)
    assert(PqStore.encodeCount === e0, "absorb must NOT full-re-encode")
    val full = codeSet(SimilarityQueries.pqEncodeFrame(spark, tmp, e))
    assert(absorbed === full,
      "the O(batch) absorb must equal a full re-encode exactly (same ADC codes)")
    // the absorbed index is a 2-segment manifest, invisible to readers:
    // the merged table's live stamp equals the cumulative stamp, so the
    // query path resolves it with zero re-encode…
    assert(PqStore.codeSegmentCount(tmp, SimilarityQueries.PqM,
      SimilarityQueries.PqK) === 2)
    SimilarityQueries.resetPqCacheForTest() // simulate a fresh session
    CorpusStamp.reset()
    val topk = graft.SparkEntry.queries("sim_pq_topk")(spark, tmp)
    assert(topk.count() > 0)
    assert(PqStore.encodeCount === e0,
      "a restarted session over the absorbed index must not re-encode")
    assert(PqStore.absorbCount === a0 + 1)
  }

  test("per-vector code completeness over an absorbed index: every vector, every subspace, once") {
    val tmp = java.nio.file.Files.createTempDirectory("pq-abs2").toString
    val e = graft.ops.Tables.table(spark, dir, "embeddings")
    e.write.parquet(s"$tmp/embeddings.parquet")
    SimilarityQueries.pqEncodeBaseFor(spark, tmp, e.filter(col("vec_id") % 3 =!= 0))
    val codes = SimilarityQueries.pqAbsorb(spark, tmp, e.filter(col("vec_id") % 3 === 0))
    val n = e.count()
    val m = SimilarityQueries.PqM.toLong
    assert(codes.count() === n * m, "one code per (vector, subspace)")
    assert(codes.select(col("n_id"), col("j")).distinct().count() === n * m,
      "no duplicate codes across segments")
    val rng = codes.agg(min(col("code")), max(col("code"))).head()
    assert(rng.getLong(0) >= 0L && rng.getLong(1) < SimilarityQueries.PqK.toLong)
  }
}
