package graft.cdc

import java.nio.charset.StandardCharsets
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager

/** Cluster-filesystem metadata IO for the state stores.
  *
  * The parquet data files always followed whatever URI Spark's Hadoop
  * layer resolves; this moves the stores' METADATA plane — manifest /
  * pointer files, listings, vacuum deletes — onto the same layer, so
  * the bucketed store runs where 100 TB actually lives (HDFS, object
  * stores through their Hadoop connectors) instead of only on one
  * machine's `java.nio` disk. The reference's state likewise lives in a
  * remote cluster, not the driver's filesystem (reference
  * src/elasticsearch.ts:15-28).
  *
  * Commit strategy: atomic swaps go through Spark's own
  * [[CheckpointFileManager]] — the exact mechanism Structured
  * Streaming trusts for its offset/commit logs:
  *
  *  - where `FileContext` + atomic `rename(OVERWRITE)` exist (HDFS,
  *    local file://), writes land in a temp file and rename into
  *    place — readers never observe a partial file;
  *  - filesystems without an `AbstractFileSystem` binding fall back to
  *    the `FileSystem`-based manager (rename-based, best-effort
  *    atomicity — same contract Spark's own metadata logs accept
  *    there);
  *  - object stores plug in rename-free managers via
  *    `spark.sql.streaming.checkpointFileManagerClass` (e.g. the S3A
  *    `AbortableStreamBasedCheckpointFileManager`, which PUTs the
  *    final object directly) — the stores inherit that deployment
  *    choice with zero code change here.
  *
  * A missed conflicting swap on a weaker backend is additionally caught
  * by the commit protocol itself: `BucketedStateStore.commitDelta`
  * re-reads the pointer before swapping (single-writer check), and data
  * files are immutable and only referenced AFTER their manifest lands.
  */
object StateIO {

  /** The session's Hadoop conf when one is active (so per-session
    * schemes, credentials and `checkpointFileManagerClass` apply);
    * vanilla defaults otherwise. Built fresh per call — callers on hot
    * paths should go through [[manager]], which amortizes it. */
  def hadoopConf: Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** One manager per (scheme, authority, session): managers are
    * stateless dispatchers over a FileContext/FileSystem handle, safe
    * to share across threads and calls. Amortizing them matters — the
    * metadata plane makes several calls per trigger, and each create
    * otherwise copies the full session conf (`newHadoopConf`) and
    * re-resolves the filesystem; a 24/7 tail would rebuild thousands of
    * identical managers a minute. The conf is captured at FIRST use of
    * a (scheme, authority) under a session — scheme registrations must
    * precede the first state-store touch of that scheme (they do: the
    * conf is deployment wiring, not per-query state). */
  private val managerCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, SparkSession), CheckpointFileManager]()

  private def manager(p: Path): CheckpointFileManager = {
    val s = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession).orNull
    val uri = p.toUri
    val key = (String.valueOf(uri.getScheme), String.valueOf(uri.getAuthority), s)
    managerCache.computeIfAbsent(key, _ => CheckpointFileManager.create(p, hadoopConf))
  }

  def exists(path: String): Boolean = {
    val p = new Path(path)
    manager(p).exists(p)
  }

  def readString(path: String): String = {
    val p = new Path(path)
    val in = manager(p).open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** All-or-nothing small-file write (see commit strategy above). */
  def writeStringAtomic(path: String, content: String): Unit = {
    val p = new Path(path)
    val m = manager(p)
    // the FileContext-based manager (unlike FileSystem.create) does not
    // create parent directories on its own
    if (p.getParent != null) m.mkdirs(p.getParent)
    val out = m.createAtomic(p, overwriteIfPossible = true)
    try { out.write(content.getBytes(StandardCharsets.UTF_8)); out.close() }
    catch { case t: Throwable => scala.util.Try(out.cancel()); throw t }
  }

  /** Children of `path` (empty if it doesn't exist). */
  def list(path: String): Vector[FileStatus] = {
    val p = new Path(path)
    val m = manager(p)
    if (!m.exists(p)) Vector.empty else m.list(p).toVector
  }

  /** Recursive delete, ignore-if-missing. */
  def delete(path: String): Unit = {
    val p = new Path(path)
    manager(p).delete(p)
  }
}
