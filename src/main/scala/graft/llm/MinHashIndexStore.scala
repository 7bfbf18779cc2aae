package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import java.nio.file.{Files, Path, StandardCopyOption}

/** Persistent MinHash/LSH posting-list index over the ARCHIVE half of
  * the corpus — the sidecar behind `pipeline_incremental_neardup`.
  *
  * The production crawl-ingest shape (the reference's tail phase is
  * the same "increment against accumulated state" motion,
  * src/processor.ts:332-396): a 100 TB archive's LSH band rows are an
  * expensive full-corpus signature pass that must be paid ONCE per
  * archive snapshot, not once per arriving batch. This store
  * materializes the archive's `(doc_id, band, bucket)` rows
  * (DedupQueries.bandRows — the dedup_minhash_pairs signature scheme)
  * as a parquet sidecar with the PqStore pointer-swap discipline:
  * versioned immutable directory + atomically-renamed pointer file, so
  * a reader never races a replacement through a delete window and a
  * crashed builder at worst leaves an orphaned unreferenced version.
  *
  * Validity is keyed on the archive row count (`_CORPUS_ROWS`): a
  * regenerated corpus re-indexes instead of silently reusing signatures
  * from vanished data — the CodebookStore/PqStore contract. The
  * harness's archive predicate (doc_id % 10 <> 0, mirroring
  * pipeline_incremental_dedup's batch split) is part of what the row
  * count fingerprints; a deployment indexes its whole archive and keys
  * on the snapshot id instead.
  */
object MinHashIndexStore {

  /** Bumped on every actual index-build job; the restart spec pins that
    * a second session loads the sidecar instead of bumping this. */
  @volatile var buildCount: Long = 0L

  private def sane(dir: String) = dir.replaceAll("[^A-Za-z0-9._-]", "_")

  private def baseFor(dir: String): Path =
    CodebookStore.indexRoot.resolve(s"minhash_archive_${sane(dir)}.parquet")

  private def pointerFor(base: Path): Path =
    base.getParent.resolve(base.getFileName.toString + ".PTR")

  /** The archive half of the harness split (the rest is the "new
    * crawl batch" probed against this index). */
  def archiveDocs(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Tables.table(spark, dir, "documents")
      .filter(col("doc_id") % 10 =!= 0)

  /** Load the persisted archive band index for `dir` if one matches
    * the live archive row count; otherwise build, persist, and return
    * it. The returned frame always reads FROM THE SIDECAR PARQUET, so
    * downstream plans scan the index, never the raw corpus. */
  def loadOrBuild(spark: SparkSession, dir: String): DataFrame = {
    val n = archiveDocs(spark, dir).count()
    load(spark, dir, n).getOrElse {
      build(spark, dir, n)
      load(spark, dir, n).getOrElse(
        sys.error(s"minhash index for $dir vanished between build and load"))
    }
  }

  private[llm] def load(spark: SparkSession, dir: String, n: Long): Option[DataFrame] = {
    val base = baseFor(dir)
    val ptr = pointerFor(base)
    val resolved =
      if (Files.exists(ptr)) Some(base.getParent.resolve(Files.readString(ptr).trim))
      else None
    resolved.filter { p =>
      val meta = p.resolve("_CORPUS_ROWS")
      Files.exists(meta) && Files.readString(meta).trim == n.toString
    }.map(p => spark.read.parquet(p.toString))
  }

  private def build(spark: SparkSession, dir: String, n: Long): Unit = {
    val base = baseFor(dir)
    Files.createDirectories(base.getParent)
    val version = java.util.UUID.randomUUID().toString
    val vdir = base.getParent.resolve(base.getFileName.toString + s".v-$version")
    DedupQueries.bandRows(archiveDocs(spark, dir).select(col("doc_id"), col("text")))
      .write.parquet(vdir.toString)
    Files.writeString(vdir.resolve("_CORPUS_ROWS"), n.toString)
    buildCount += 1
    val ptr = pointerFor(base)
    val previous =
      if (Files.exists(ptr)) Some(Files.readString(ptr).trim).filter(_.nonEmpty)
      else None
    val tmp = Files.createTempFile(base.getParent, ptr.getFileName.toString, ".tmp")
    Files.writeString(tmp, vdir.getFileName.toString)
    Files.move(tmp, ptr, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // reclaim versions neither current nor immediately-previous (a
    // concurrent session may hold a lazy DataFrame over the previous
    // one, so it survives one more generation)
    val prefix = base.getFileName.toString + ".v-"
    val keep = Set(vdir.getFileName.toString) ++ previous
    val listing = Files.list(base.getParent)
    try listing.forEach { q =>
      val name = q.getFileName.toString
      if (name.startsWith(prefix) && !keep.contains(name))
        try org.apache.commons.io.FileUtils.deleteDirectory(q.toFile)
        catch { case _: java.io.IOException => () }
    } finally listing.close()
  }
}
