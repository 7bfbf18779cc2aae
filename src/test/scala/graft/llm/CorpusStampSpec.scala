package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The session-cached corpus stamp behind every sidecar consumer
  * (r14 verdict #7 + advice): one fingerprint job per (dir, table) per
  * session across ALL consumers, and a content component that
  * invalidates a regenerated corpus even at identical cardinality.
  */
class CorpusStampSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("one stamp job per (dir, table) per session across all sidecar consumers") {
    CorpusStamp.reset()
    val j0 = CorpusStamp.jobCount
    // three consumers over two tables: embeddings (codebook + knn
    // graph) stamps once, documents (LR weights) stamps once
    CodebookStore.loadOrTrain(spark, dir)
    KnnGraphStore.loadOrBuild(spark, dir)
    LrModel.loadOrTrain(spark, dir)
    assert(CorpusStamp.jobCount === j0 + 2,
      "embeddings + documents must each stamp exactly once")
    // every further call — any consumer — reuses the cached stamp
    KnnGraphStore.loadOrBuild(spark, dir)
    CodebookStore.loadOrTrain(spark, dir)
    LrModel.loadOrTrain(spark, dir)
    MinHashIndexStore.loadOrBuild(spark, dir)
    MinHashIndexStore.loadOrBuild(spark, dir)
    assert(CorpusStamp.jobCount === j0 + 3,
      "second calls must run ZERO new stamp jobs (archive variant adds its one)")
  }

  test("the stamp is a pure function of the id set, not the row order") {
    import org.apache.spark.sql.functions._
    val e = graft.ops.Tables.table(spark, dir, "embeddings")
    val tmpA = java.nio.file.Files.createTempDirectory("stamp-a").toString
    val tmpB = java.nio.file.Files.createTempDirectory("stamp-b").toString
    e.orderBy(col("vec_id")).coalesce(1).write.parquet(s"$tmpA/embeddings.parquet")
    e.orderBy(col("vec_id").desc).repartition(4).write.parquet(s"$tmpB/embeddings.parquet")
    val a = CorpusStamp.of(spark, tmpA, "embeddings", "vec_id")
    val b = CorpusStamp.of(spark, tmpB, "embeddings", "vec_id")
    assert(a === b, "same id set, any order/partitioning → same stamp")
  }

  test("same cardinality, different content → different stamp, sidecar rebuilds") {
    import org.apache.spark.sql.functions._
    val e = graft.ops.Tables.table(spark, dir, "embeddings")
    val tmp1 = java.nio.file.Files.createTempDirectory("stampc-1").toString
    val tmp2 = java.nio.file.Files.createTempDirectory("stampc-2").toString
    e.write.parquet(s"$tmp1/embeddings.parquet")
    // a "regenerated" corpus: identical row count, shifted id space
    e.withColumn("vec_id", col("vec_id") + 1000000L)
      .write.parquet(s"$tmp2/embeddings.parquet")
    val s1 = CorpusStamp.of(spark, tmp1, "embeddings", "vec_id")
    val s2 = CorpusStamp.of(spark, tmp2, "embeddings", "vec_id")
    assert(s1.rows === s2.rows)
    assert(s1.fp !== s2.fp, "the content fingerprint must move with the id set")
    // the collision the count-only fingerprint missed: graft tmp1's
    // sidecar onto tmp2's name — the fp mismatch must force a rebuild
    KnnGraphStore.loadOrBuild(spark, tmp1).count()
    val sane1 = tmp1.replaceAll("[^A-Za-z0-9._-]", "_")
    val sane2 = tmp2.replaceAll("[^A-Za-z0-9._-]", "_")
    val root = CodebookStore.indexRoot
    val listing = java.nio.file.Files.list(root)
    try listing.forEach { p =>
      val name = p.getFileName.toString
      if (name.contains(sane1)) {
        val renamed = root.resolve(name.replace(sane1, sane2))
        if (java.nio.file.Files.isDirectory(p))
          org.apache.commons.io.FileUtils.copyDirectory(p.toFile, renamed.toFile)
        else java.nio.file.Files.copy(p, renamed,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    } finally listing.close()
    val b0 = KnnGraphStore.buildCount
    KnnGraphStore.loadOrBuild(spark, tmp2).count()
    assert(KnnGraphStore.buildCount === b0 + 1,
      "equal-cardinality stale sidecar must rebuild, not silently serve")
  }
}
