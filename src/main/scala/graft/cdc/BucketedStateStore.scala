package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.{DArr, DInt, DObj, DStr, DVal, Json, TaskSpec}

/** Incremental, log-structured state persistence for the CDC tail — the
  * 100 TB form of [[StateStore]] (VERDICT r6 #1; the design
  * `BatchApplier`'s Scaladoc promises).
  *
  * The legacy [[StateStore]] path rewrites the ENTIRE state every
  * micro-batch: O(state) shuffle + parquet write per 5 s trigger, which
  * cannot survive state ≫ batch. This store makes the per-batch cost a
  * function of the BATCH, not the state:
  *
  *  - The key space is hash-partitioned into a FIXED number of buckets
  *    (`pmod(hash(id), nBuckets)`); each bucket owns one BASE file
  *    directory (id-sorted parquet).
  *  - Data files are immutable. A micro-batch commit writes ONE shared
  *    DELTA directory holding the batch's per-key outcomes (upserts +
  *    delete tombstones) — an O(batch) write in O(task-count) files,
  *    NOT one file per bucket: a hash-bucketed batch dirties many
  *    buckets at once, and per-bucket delta files would drown the
  *    commit in tiny-file overhead.
  *  - A versioned MANIFEST (JSON, atomically swapped pointer — the same
  *    trick a Delta/Iceberg transaction log uses) maps each bucket to
  *    its base + the ordered delta commits that TOUCHED it. Untouched
  *    buckets keep their entries verbatim — their read path never grows
  *    — while dirty buckets reference the shared delta directory.
  *  - Reads resolve last-writer-wins per key across base ∪ deltas:
  *    the row from the highest commit `__seq` wins (each commit's row
  *    already beat the state visible to it, so commit order IS the
  *    resolution order); `action = delete` tombstones erase the key.
  *  - Buckets whose delta chain exceeds `compactThreshold` are merged
  *    (base ∪ deltas → new base, tombstones dropped) in one amortized
  *    job covering all over-threshold buckets.
  *
  * Per-batch state ACCESS is a point lookup, not a scan-and-rewrite:
  * the prior docs for exactly the batch's keys come from a broadcast
  * hash join of the (small) key set against only the dirty buckets'
  * files — the engine-owned analog of the reference's batched ES
  * `mget` (S6, reference src/elasticsearch.ts:30-63). The state side
  * streams through the join co-located with its files: no exchange
  * ever materializes the state (pinned by BucketedStateSpec's plan
  * assertion). A `min(id)..max(id)` range predicate on the scan is
  * pushed to parquet, so with id-sorted bases (written sorted) and a
  * key-local batch, row-group min/max skipping prunes below bucket
  * granularity.
  *
  * Sizing at 100 TB: pick `nBuckets ≈ state_bytes / 128 MB` so a bucket
  * is one healthy parquet file; per-batch read cost is then
  * `dirtyBuckets/nBuckets × state` in the worst (uniformly random keys)
  * case and `O(batch)` when updates exhibit key locality (the common
  * CDC regime — hot working set), while the WRITE cost is always
  * O(batch). This is the LSM trade: reads pay a bounded delta-chain
  * merge, writes never touch cold data.
  *
  * Crash safety: data writes land before the manifest pointer swap, so
  * a crash mid-commit leaves an orphaned (unreferenced) delta directory
  * and the previous manifest — readers never see partial commits, and a
  * foreachBatch replay simply re-derives the same outcomes against the
  * old manifest (the LWW ts-guard makes the replayed values identical).
  * [[vacuum]] retains the last `retainManifests` manifests for time
  * travel and deletes data directories no retained manifest references.
  */
object BucketedStateStore {

  /** Tuning: `nBuckets` fixes the key partitioning at creation (stored
    * in the manifest — later Specs cannot change it); `compactThreshold`
    * bounds a bucket's delta-chain length; `retainManifests` bounds
    * time-travel history (and therefore disk) for [[vacuum]]. */
  final case class Spec(
      nBuckets: Int = 64,
      compactThreshold: Int = 8,
      retainManifests: Int = 3)

  final case class BucketFiles(base: Option[String], deltas: Vector[String]) {
    def paths: Seq[String] = base.toSeq ++ deltas
  }

  final case class Manifest(nBuckets: Int, seq: Long, buckets: Map[Int, BucketFiles]) {
    def livePaths(dir: String, bucket: Int): Seq[String] =
      buckets.get(bucket).toSeq.flatMap(_.paths).map(rel => s"$dir/$rel")
    /** Paths for a SET of buckets, deduplicated: delta dirs are shared
      * across the buckets one commit touched. */
    def livePathsFor(dir: String, bs: Iterable[Int]): Seq[String] =
      bs.toSeq.sorted.flatMap(livePaths(dir, _)).distinct
    def allLivePaths(dir: String): Seq[String] =
      livePathsFor(dir, buckets.keys)
    def render: String = DObj(
      "nBuckets" -> DInt(nBuckets),
      "seq" -> DInt(seq),
      "buckets" -> DObj(buckets.toVector.sortBy(_._1).map { case (b, f) =>
        val fields = f.base.map(p => "base" -> (DStr(p): DVal)).toVector :+
          ("deltas" -> (DArr(f.deltas.map(DStr(_): DVal)): DVal))
        b.toString -> (DObj(fields): DVal)
      })).render
  }

  object Manifest {
    def parse(s: String): Manifest = {
      val o = Json.parseObj(s)
      def int(v: DVal): Long = v match { case DInt(i) => i; case other => other.render.toLong }
      val buckets = o.get("buckets") match {
        case Some(bo: DObj) => bo.fields.map { case (k, v) =>
          val f = v.asInstanceOf[DObj]
          val base = f.get("base").collect { case DStr(p) => p }
          val deltas = f.get("deltas") match {
            case Some(DArr(items)) => items.collect { case DStr(p) => p }
            case _                 => Vector.empty[String]
          }
          k.toInt -> BucketFiles(base, deltas)
        }.toMap
        case _ => Map.empty[Int, BucketFiles]
      }
      Manifest(int(o.get("nBuckets").get).toInt, int(o.get("seq").get), buckets)
    }
  }

  /** Bucket assignment: Spark's codegen'd Murmur3 `hash`, stable across
    * the write and every later read/lookup of the same store. */
  def bucketCol(n: Int): Column = pmod(hash(col("id")), lit(n))

  // ---- manifest persistence (pointer swap, like StateStore.write) ----
  // All metadata IO goes through [[StateIO]] (the Hadoop FileSystem
  // layer), so `dir` may be any URI Spark itself can read — HDFS, an
  // object store via its connector, or a plain local path.

  private def pointer(dir: String) = s"$dir/MANIFEST"

  def exists(dir: String): Boolean = StateIO.exists(pointer(dir))

  def readManifest(dir: String): Option[Manifest] = {
    if (!StateIO.exists(pointer(dir))) None
    else {
      val v = StateIO.readString(pointer(dir)).trim.toLong
      Some(Manifest.parse(StateIO.readString(s"$dir/manifest/m_$v.json")))
    }
  }

  /** A RETAINED manifest by commit seq (None once vacuum dropped it) —
    * the time-travel entry point the retained-manifest chain exists
    * for. */
  def manifestAt(dir: String, seq: Long): Option[Manifest] = {
    val p = s"$dir/manifest/m_$seq.json"
    if (StateIO.exists(p)) Some(Manifest.parse(StateIO.readString(p))) else None
  }

  private def writeManifest(dir: String, m: Manifest): Unit = {
    StateIO.writeStringAtomic(s"$dir/manifest/m_${m.seq}.json", m.render)
    StateIO.writeStringAtomic(pointer(dir), m.seq.toString)
  }

  // ---- reading ----

  private val fileSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("doc", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("parent", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("action", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("__seq", org.apache.spark.sql.types.LongType)))

  private def scanPaths(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.schema(fileSchema).parquet(paths: _*)

  /** Scan the rows of `buckets` with per-delta bucket SCOPING — the
    * guard against tombstone resurrection. A shared delta dir can
    * physically hold a row of a bucket that compacted SINCE the commit
    * (its chain no longer references the delta, and compaction dropped
    * the key's tombstone from the new base); reading that row through
    * ANOTHER bucket's chain would revive a deleted key as the highest
    * `__seq` version. So: base dirs scan unscoped (a base leaf holds
    * exactly one bucket's rows by construction), while each delta dir
    * is filtered to the buckets whose CURRENT chain references it.
    * Deltas sharing an owner set share one scan, so every live file is
    * still read exactly once. */
  private def scanBuckets(
      spark: SparkSession, dir: String, m: Manifest, buckets: Iterable[Int]): DataFrame = {
    val bs = buckets.toSet
    val basePaths = bs.toSeq.sorted
      .flatMap(b => m.buckets.get(b).flatMap(_.base)).map(rel => s"$dir/$rel")
    val deltaOwners: Map[String, Set[Int]] = bs.toSeq
      .flatMap(b => m.buckets.get(b).toSeq.flatMap(_.deltas.map(_ -> b)))
      .groupBy(_._1).map { case (rel, owners) => rel -> owners.map(_._2).toSet }
    val deltaScans = deltaOwners.toSeq
      .groupBy(_._2).toSeq
      .map { case (owners, rels) => (owners.toSeq.sorted, rels.map(_._1).sorted) }
      .sortBy(_._2.head)
      .map { case (owners, rels) =>
        scanPaths(spark, rels.map(rel => s"$dir/$rel"))
          .filter(bucketCol(m.nBuckets).isin(owners.map(Integer.valueOf): _*))
      }
    val parts =
      (if (basePaths.isEmpty) Nil else Seq(scanPaths(spark, basePaths))) ++ deltaScans
    if (parts.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], fileSchema)
    else parts.reduce(_ unionByName _)
  }

  /** LWW resolution across base+delta rows: highest commit wins (a key
    * appears at most once per commit), tombstones erase. */
  private def resolve(rows: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("__seq").desc)
    rows.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("action") =!= "delete")
      .select(StateStore.schemaCols.map(col): _*)
  }

  /** Current live state (id, doc, parent, ts) — the full-table read the
    * verify queries and restarts use; per-batch applies never call it.
    *
    * CLEAN buckets (base file, no delta chain) already hold exactly the
    * live rows — compaction resolved them — so they scan straight
    * through with NO exchange; only delta-bearing buckets pay the LWW
    * window. On a mostly-compacted 100 TB store the full read is
    * therefore shuffle-free for almost all of the data instead of
    * re-windowing every row. */
  def read(spark: SparkSession, dir: String): DataFrame =
    readFrom(spark, dir, readManifest(dir))

  /** Time-travel read: the live state AS OF commit `seq`. Safe for any
    * manifest vacuum still retains (vacuum only deletes data files no
    * retained manifest references); None once the manifest is gone. */
  def readAt(spark: SparkSession, dir: String, seq: Long): Option[DataFrame] =
    manifestAt(dir, seq).map(m => readFrom(spark, dir, Some(m)))

  private def readFrom(spark: SparkSession, dir: String, mOpt: Option[Manifest]): DataFrame =
    mOpt match {
      case Some(m) if m.buckets.nonEmpty =>
        val (clean, dirty) = m.buckets.partition(_._2.deltas.isEmpty)
        val parts = Seq(
          if (clean.isEmpty) None
          else Some(scanPaths(spark, m.livePathsFor(dir, clean.keys))
            .select(StateStore.schemaCols.map(col): _*)),
          if (dirty.isEmpty) None
          else Some(resolve(scanBuckets(spark, dir, m, dirty.keys))),
        ).flatten
        parts.reduce(_ unionByName _)
      case _ => StateStore.empty(spark)
    }

  /** Seed the store from a full state DataFrame (the scan backfill, L5
    * start): one id-sorted base file per bucket, manifest seq 0. */
  def seed(state: DataFrame, dir: String, spec: Spec): Unit = {
    val spark = state.sparkSession
    val rel = "data/base_0"
    state.select(StateStore.schemaCols.map(col): _*)
      .withColumn("action", lit("upsert"))
      .withColumn("__seq", lit(0L))
      .withColumn("__bucket", bucketCol(spec.nBuckets))
      .repartition(col("__bucket"))
      .sortWithinPartitions(col("__bucket"), col("id"))
      .write.partitionBy("__bucket").mode("overwrite").parquet(s"$dir/$rel")
    val buckets = listBucketDirs(dir, rel)
    writeManifest(dir, Manifest(spec.nBuckets, 0L,
      buckets.map { case (b, p) => b -> BucketFiles(Some(p), Vector.empty) }))
  }

  /** Prior state rows for EXACTLY the batch's keys — the engine's
    * `mget`. Only dirty buckets' files are touched; the key set is
    * broadcast so the state side never shuffles; the id range predicate
    * reaches parquet row-group stats. */
  def priorFor(spark: SparkSession, dir: String, keys: DataFrame): DataFrame =
    readManifest(dir) match {
      case None => StateStore.empty(spark)
      case Some(m) =>
        val st = keyStats(m.nBuckets, keys)
        priorForStats(spark, dir, m, keys, st)
    }

  /** One tiny aggregate over the (persisted) key set: dirty bucket ids,
    * the id range, and the key count — everything the planner-side
    * pruning needs, in a single job. */
  private final case class KeyStats(dirty: Set[Int], lo: String, hi: String, n: Long)

  private def keyStats(nBuckets: Int, keys: DataFrame): KeyStats = {
    val row = keys.agg(
      collect_set(bucketCol(nBuckets)).as("bs"),
      min(col("id")).as("lo"),
      max(col("id")).as("hi"),
      count(lit(1)).as("n")).head()
    KeyStats(row.getSeq[Int](0).toSet, row.getString(1), row.getString(2), row.getLong(3))
  }

  /** Above this many distinct batch keys the point-lookup stops forcing
    * a broadcast (a catch-up storm batch could be millions of keys —
    * hundreds of MB on every executor) and lets the planner pick the
    * join; correctness is unchanged, the state side merely shuffles for
    * that oversized trigger. */
  private[graft] val BroadcastKeyLimit = 500000L

  private def priorForStats(
      spark: SparkSession, dir: String, m: Manifest,
      keys: DataFrame, st: KeyStats): DataFrame = {
    val paths = m.livePathsFor(dir, st.dirty)
    if (paths.isEmpty || st.lo == null) StateStore.empty(spark)
    else {
      val keySide =
        if (st.n <= BroadcastKeyLimit) broadcast(keys.select(col("id")).distinct())
        else keys.select(col("id")).distinct()
      resolve(
        scanBuckets(spark, dir, m, st.dirty)
          .filter(col("id") >= lit(st.lo) && col("id") <= lit(st.hi))
          .join(keySide, Seq("id")))
    }
  }

  /** The store is SINGLE-WRITER by contract (one streaming query owns a
    * checkpoint dir); this detects a violated contract rather than
    * silently orphaning one writer's commit: the manifest pointer is
    * re-read immediately before each swap and the commit aborts if
    * another writer advanced it since our manifest was loaded. */
  private def checkPointerUnmoved(dir: String, expected: Long): Unit = {
    val cur = readManifest(dir).map(_.seq).getOrElse(-1L)
    if (cur != expected)
      throw new java.util.ConcurrentModificationException(
        s"concurrent writer on bucketed state at $dir: manifest seq moved " +
          s"$expected -> $cur since this commit loaded it; aborting (single-writer contract)")
  }

  /** Commit one micro-batch's per-key outcomes `(id, doc, parent, ts,
    * action)` as ONE shared delta directory referenced by every dirty
    * bucket, then compact any bucket whose delta chain crossed the
    * threshold. Returns the new manifest seq. Fails (without swapping
    * the pointer) if a concurrent writer committed in between; the
    * `preSwap` hook exists for the spec to interpose exactly that.  */
  def commitDelta(
      applied: DataFrame, dir: String, spec: Spec, dirty: Set[Int],
      preSwap: () => Unit = () => ()): Long = {
    val spark = applied.sparkSession
    val m = readManifest(dir).getOrElse(Manifest(spec.nBuckets, -1L, Map.empty))
    val seq = m.seq + 1
    val rel = s"data/delta_$seq"
    applied
      .withColumn("__seq", lit(seq))
      .sortWithinPartitions(col("id")) // row-group stats for later pruning
      .write.mode("overwrite").parquet(s"$dir/$rel")
    var next = Manifest(m.nBuckets, seq, dirty.foldLeft(m.buckets) { (acc, b) =>
      val cur = acc.getOrElse(b, BucketFiles(None, Vector.empty))
      acc.updated(b, cur.copy(deltas = cur.deltas :+ rel))
    })
    preSwap()
    checkPointerUnmoved(dir, m.seq)
    writeManifest(dir, next)

    // amortized compaction: all over-threshold buckets in ONE job,
    // scanned bucket-scoped so a stale shared-delta row of an
    // already-compacted bucket can never bake into the new base.
    val toCompact = next.buckets.filter(_._2.deltas.size >= spec.compactThreshold).keys.toSeq.sorted
    if (toCompact.nonEmpty) {
      val cseq = next.seq + 1
      val crel = s"data/base_$cseq"
      resolve(scanBuckets(spark, dir, next, toCompact))
        .withColumn("action", lit("upsert"))
        .withColumn("__seq", lit(cseq))
        .withColumn("__bucket", bucketCol(next.nBuckets))
        .repartition(col("__bucket"))
        .sortWithinPartitions(col("__bucket"), col("id"))
        .write.partitionBy("__bucket").mode("overwrite").parquet(s"$dir/$crel")
      val compacted = listBucketDirs(dir, crel)
      val rebased = toCompact.foldLeft(next.buckets) { (acc, b) =>
        compacted.get(b) match {
          case Some(p) => acc.updated(b, BucketFiles(Some(p), Vector.empty))
          case None    => acc - b // bucket fully deleted
        }
      }
      next = Manifest(next.nBuckets, cseq, rebased)
      checkPointerUnmoved(dir, seq) // our own delta swap must still be current
      writeManifest(dir, next)
    }
    vacuum(dir, spec.retainManifests)
    next.seq
  }

  /** The full incremental micro-batch apply: point-lookup prior state
    * for the batch's keys, run the fused compact+dispatch+LWW fold
    * (which itself semi-joins the source snapshot down to the batch's
    * keys), and commit the outcomes as one shared delta. */
  def applyBatch(
      events: Dataset[OplogRow],
      task: TaskSpec,
      dir: String,
      spec: Spec,
      source: Option[DataFrame] = None,
      dropped: Option[org.apache.spark.util.LongAccumulator] = None,
      // load-leg side output: the batch's per-key outcomes (id, doc,
      // parent, ts, action), exactly what the commit writes — e.g. the
      // tail's bulk-body emitter (L2). The frame is persisted around
      // the commit when a consumer is present, so the fold runs once.
      onOutcomes: Option[DataFrame => Unit] = None,
  ): Long = {
    val spark = events.sparkSession
    val keys = events.select(col("id")).distinct().persist()
    try {
      val m = readManifest(dir)
      val n = m.map(_.nBuckets).getOrElse(spec.nBuckets)
      val st = keyStats(n, keys)
      val prior = m.map(priorForStats(spark, dir, _, keys, st))
        .getOrElse(StateStore.empty(spark))
      val applied0 = BatchApplier.applyOplogBatchKeepDeletes(
        events, prior, task, source, dropped, batchKeyCount = Some(st.n))
      val applied = if (onOutcomes.isDefined) applied0.persist() else applied0
      try {
        val r = commitDelta(applied, dir, spec, st.dirty)
        onOutcomes.foreach(f => f(applied))
        r
      } finally if (onOutcomes.isDefined) { applied.unpersist(); () }
    } finally { keys.unpersist(); () }
  }

  /** Re-bucket the store to `newNBuckets` — the maintenance operation a
    * growing deployment runs when buckets outgrow their target size
    * (the sizing rule in the class doc: nBuckets ≈ state / 128 MB).
    * One full read → one partitioned rewrite → one manifest swap; the
    * store stays readable throughout (readers resolve the old manifest
    * until the pointer moves), and the next vacuum reclaims the old
    * layout. Run it BETWEEN micro-batches (same single-writer contract
    * as commits themselves). */
  def reshard(spark: SparkSession, dir: String, newNBuckets: Int): Unit = {
    val m = readManifest(dir).getOrElse(
      throw new IllegalStateException(s"no bucketed state at $dir to reshard"))
    val seq = m.seq + 1
    val rel = s"data/base_$seq"
    read(spark, dir)
      .withColumn("action", lit("upsert"))
      .withColumn("__seq", lit(seq))
      .withColumn("__bucket", bucketCol(newNBuckets))
      .repartition(col("__bucket"))
      .sortWithinPartitions(col("__bucket"), col("id"))
      .write.partitionBy("__bucket").mode("overwrite").parquet(s"$dir/$rel")
    val buckets = listBucketDirs(dir, rel)
    writeManifest(dir, Manifest(newNBuckets, seq,
      buckets.map { case (b, p) => b -> BucketFiles(Some(p), Vector.empty) }))
    vacuum(dir, 1) // the old bucketing is not time-travel-compatible
  }

  /** Keep the newest `retain` manifests; delete older manifest files
    * and any data bucket directory none of the retained manifests
    * references. Bounds disk to retained-history size (VERDICT r6 #2).
    */
  def vacuum(dir: String, retain: Int): Unit = {
    if (!StateIO.exists(s"$dir/manifest")) return
    val current = StateIO.readString(pointer(dir)).trim.toLong
    val all = StateIO.list(s"$dir/manifest")
      .flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("m_") && n.endsWith(".json"))
          scala.util.Try(n.stripPrefix("m_").stripSuffix(".json").toLong).toOption.map(_ -> n)
        else None
      }.sortBy(_._1)
    val keepSeqs = all.map(_._1).filter(_ <= current).takeRight(math.max(1, retain)).toSet + current
    val referenced: Set[String] = keepSeqs.flatMap { s =>
      val p = s"$dir/manifest/m_$s.json"
      if (!StateIO.exists(p)) Set.empty[String]
      else Manifest.parse(StateIO.readString(p)).buckets.values.flatMap(_.paths).toSet
    }
    all.filterNot(m => keepSeqs.contains(m._1))
      .foreach(m => StateIO.delete(s"$dir/manifest/${m._2}"))
    // two layouts live under data/: shared delta dirs (referenced as a
    // whole, plain parquet inside) and base dirs (referenced per
    // `__bucket=i` leaf). Delete whatever no retained manifest names.
    StateIO.list(s"$dir/data").filter(_.isDirectory).foreach { commitSt =>
      val relDir = s"data/${commitSt.getPath.getName}"
      if (!referenced.contains(relDir)) {
        val leaves = StateIO.list(s"$dir/$relDir")
          .filter(_.getPath.getName.startsWith("__bucket="))
        if (leaves.isEmpty) StateIO.delete(s"$dir/$relDir") // shared delta, unreferenced
        else {
          leaves.foreach { leaf =>
            val rel = s"$relDir/${leaf.getPath.getName}"
            if (!referenced.contains(rel)) StateIO.delete(s"$dir/$rel")
          }
          if (StateIO.list(s"$dir/$relDir").forall(!_.getPath.getName.startsWith("__bucket=")))
            StateIO.delete(s"$dir/$relDir")
        }
      }
    }
  }

  /** Bucket leaf dirs actually written under `dir/rel` → relative path
    * per bucket id (a partitionBy writer only creates dirs for buckets
    * present in the data). */
  private def listBucketDirs(dir: String, rel: String): Map[Int, String] =
    StateIO.list(s"$dir/$rel").collect {
      case st if st.getPath.getName.startsWith("__bucket=") =>
        st.getPath.getName.stripPrefix("__bucket=").toInt -> s"$rel/${st.getPath.getName}"
    }.toMap
}
