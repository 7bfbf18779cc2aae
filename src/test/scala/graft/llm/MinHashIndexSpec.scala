package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The incremental near-dup path: the persisted archive MinHash index
  * must (a) give exactly the flags a from-scratch signature pass gives,
  * (b) never rebuild when a matching sidecar exists — restart = zero
  * re-index jobs — and (c) invalidate on archive change.
  */
class MinHashIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("incremental neardup matches a from-scratch brute-force model") {
    val got = graft.SparkEntry.queries("pipeline_incremental_neardup")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap

    // brute force: recompute band rows for everything, flag batch docs
    // sharing any (band, bucket) with an archive doc
    val bands = DedupQueries.bandRows(
        graft.ops.Tables.table(spark, dir, "documents").select(col("doc_id"), col("text")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val archiveBuckets = bands.collect {
      case (id, band, bucket) if id % 10 != 0 => (band, bucket)
    }.toSet
    val batchIds = graft.ops.Tables.table(spark, dir, "documents")
      .filter(col("doc_id") % 10 === 0).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val expected = batchIds.map { id =>
      id -> bands.exists { case (b, band, bucket) =>
        b == id && archiveBuckets((band, bucket))
      }
    }.toMap

    assert(got === expected)
    assert(got.values.exists(identity), "fixture must surface some near-dups")
    assert(got.values.exists(!_), "and some novel docs")
  }

  test("restart loads the sidecar: zero re-index jobs, identical flags") {
    val r1 = graft.SparkEntry.queries("pipeline_incremental_neardup")(spark, dir)
      .collect().toSeq
    val b0 = MinHashIndexStore.buildCount
    // a restarted session holds no in-JVM state at all for this store —
    // the only cache IS the sidecar; a second run must load it
    val r2 = graft.SparkEntry.queries("pipeline_incremental_neardup")(spark, dir)
      .collect().toSeq
    assert(MinHashIndexStore.buildCount === b0,
      "second session must NOT re-run the archive signature pass")
    assert(r1 === r2, "reloaded index must give bit-identical flags")
  }

  test("absorb appends an O(batch) delta: union equals a full re-index, zero rebuild jobs") {
    val tmp = java.nio.file.Files.createTempDirectory("mh_absorb").toString
    val docs = graft.ops.Tables.table(spark, dir, "documents")
    docs.write.parquet(s"$tmp/documents.parquet")
    MinHashIndexStore.loadOrBuild(spark, tmp).count() // base segment
    val (b0, a0) = (MinHashIndexStore.buildCount, MinHashIndexStore.absorbCount)

    // the batch gets ACCEPTED into the archive: index absorbs only its rows
    val batch = docs.filter(col("doc_id") % 10 === 0).select(col("doc_id"), col("text"))
    val absorbed = MinHashIndexStore.absorb(spark, tmp, batch)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(MinHashIndexStore.buildCount === b0,
      "absorbing a batch must never re-signature the archive")
    assert(MinHashIndexStore.absorbCount === a0 + 1)

    val full = DedupQueries.bandRows(docs.select(col("doc_id"), col("text")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(absorbed === full, "base + delta must equal a from-scratch index of archive+batch")

    // a second delta stacks (the LSM manifest holds many segments)
    val more = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val absorbed2 = MinHashIndexStore.absorb(spark, tmp, more)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(MinHashIndexStore.absorbCount === a0 + 2)
    assert(absorbed2.size > absorbed.size, "second segment's rows must be visible")

    // compaction folds the 3-segment manifest to one; band rows and
    // covered-count accounting unchanged, no re-signature
    assert(MinHashIndexStore.segmentCount(tmp) === 3)
    val compacted = MinHashIndexStore.compact(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(MinHashIndexStore.segmentCount(tmp) === 1)
    assert(compacted === absorbed2, "compaction must not change the band rows")
    assert(MinHashIndexStore.buildCount === b0,
      "compaction is a file fold, never a re-signature")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("a reader holding the pre-absorb manifest survives the swap (one-generation keep)") {
    val tmp = java.nio.file.Files.createTempDirectory("mh_swap").toString
    val docs = graft.ops.Tables.table(spark, dir, "documents")
    docs.write.parquet(s"$tmp/documents.parquet")
    val before = MinHashIndexStore.loadOrBuild(spark, tmp) // lazy over the old manifest
    val nBefore = before.count()
    val batch = docs.filter(col("doc_id") % 10 === 0).select(col("doc_id"), col("text"))
    MinHashIndexStore.absorb(spark, tmp, batch).count()
    // the swap must not have deleted the segments the old frame reads:
    // a concurrent session's in-flight scan survives one generation
    assert(before.count() === nBefore,
      "pre-swap DataFrame must still scan after absorb replaced the manifest")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("a changed archive invalidates the sidecar (row-count fingerprint)") {
    val tmp = java.nio.file.Files.createTempDirectory("mh_corpus").toString
    val docs = graft.ops.Tables.table(spark, dir, "documents")
    docs.write.parquet(s"$tmp/documents.parquet")
    val b0 = MinHashIndexStore.buildCount
    MinHashIndexStore.loadOrBuild(spark, tmp).count()
    assert(MinHashIndexStore.buildCount === b0 + 1, "fresh dir must build")
    MinHashIndexStore.loadOrBuild(spark, tmp).count()
    assert(MinHashIndexStore.buildCount === b0 + 1, "matching sidecar must load")
    // the fingerprint check itself: the sidecar only resolves for the
    // archive row count it was built from — a regenerated corpus (any
    // other count) must miss and re-index
    val n = MinHashIndexStore.archiveDocs(spark, tmp).count()
    assert(MinHashIndexStore.load(spark, tmp, n).isDefined)
    assert(MinHashIndexStore.load(spark, tmp, n - 1).isEmpty,
      "a mismatched archive row count must NOT resolve the sidecar")
    assert(MinHashIndexStore.load(spark, tmp, n + 100).isEmpty)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }
}
