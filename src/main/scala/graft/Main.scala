package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.model.{EngineConfig, TaskDef}
import graft.pipeline.Runner

/** The engine's CLI entry point — the reference's `src/main.ts:9-21`
  * (read config path from argv, call `run`) fused with `src/index.ts:
  * 7-39` (`Indices.init` → per-task scan → concurrent tails) as one
  * binary:
  *
  *   spark-submit --class graft.Main engine.jar config.json baseDir dataDir
  *
  *  - `config.json`: the reference-format config, parsed field-for-field
  *    by [[graft.model.EngineConfig]].
  *  - `baseDir`: engine-owned output root — sink tables (DDL), state
  *    stores and streaming checkpoints, one subtree per task.
  *  - `dataDir`: source root. Per task the adapters look for
  *    `<dataDir>/<task-name>/snapshot` (parquet, columns `id`,`doc`) and
  *    `<dataDir>/<task-name>/oplog` (JSON-lines dumps served by the
  *    DSv2 [[graft.source.v2.OplogJsonSource]], which honors the
  *    config's admission budget); a task dir missing both falls back to
  *    the shared `<dataDir>/snapshot` + `<dataDir>/oplog`. On a live
  *    deployment the same two hooks are where the Mongo collection
  *    $snapshot and change-stream connectors plug in — the config's
  *    connection options arrive pre-flattened either way.
  *
  * The process runs until any tail query fails or is stopped, exactly
  * like the reference's long-lived daemon.
  */
object Main {

  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: graft.Main <config.json> <baseDir> <dataDir>")
      sys.exit(2)
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-engine")
      .withExtensions(new graft.expressions.GraftExtensions)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      // Micro-batch shuffles should size to BATCH volume, not cluster
      // width: a CDC trigger carries MBs, and fixed per-task costs of
      // width-sized shuffle stages dominate the trigger (measured 1.8×
      // tail-throughput loss at 32 threads; BASELINE.md r9). AQE
      // coalesces them down when told not to chase parallelism first.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = run(spark, args(0), args(1), args(2))
    if (queries.isEmpty) { spark.stop(); return }
    spark.streams.awaitAnyTermination()
  }

  /** Wire config → DDL → scan → tails; returns the running tail
    * queries (one per task). Separated from [[main]] so tests can
    * drive a full config lifecycle without the terminal await. */
  def run(spark: SparkSession, configPath: String, baseDir: String, dataDir: String): Seq[StreamingQuery] = {
    val config = EngineConfig.fromJson(graft.cdc.StateIO.readString(configPath))
    // optional user checkpoint mirroring (the reference example's Redis
    // callbacks, examples/example.js:9-18): SPARK_GRAFT_HOOKS_DIR wires
    // the shipped file-backed sample; a deployment passes its own
    // CheckpointHooks to Runner.fromConfig directly
    val hooks = sys.env.get("SPARK_GRAFT_HOOKS_DIR")
      .map(new graft.model.FileCheckpointHooks(_))
    // an http(s) mongodb.url selects the live wire leg (the extended-
    // JSON-over-HTTP protocol of graft.source.v2.MongoHttpSource). A
    // native `mongodb://` / `mongodb+srv://` URL — the reference's own
    // config shape (config.ts:5-7) — delegates to the same wire leg
    // through the sidecar that fronts the replica set:
    // `mongodb.options.sidecarUrl` names it, and the deployment
    // contract (protocol + reference sidecar sketch) is documented in
    // examples/README.md. Without a sidecar a mongodb:// config runs
    // against the file-backed harness adapters (dev mode — the
    // reference's example config works verbatim on file dumps), as
    // does any other URL shape.
    val adapters =
      if (config.mongodbUrl.startsWith("http://") || config.mongodbUrl.startsWith("https://"))
        httpAdapters(spark, config.mongodbUrl) _
      else if (config.mongodbUrl.startsWith("mongodb://") ||
               config.mongodbUrl.startsWith("mongodb+srv://"))
        config.mongoSourceOptions.get("sidecarUrl") match {
          case Some(s) if s.startsWith("http://") || s.startsWith("https://") =>
            httpAdapters(spark, s) _
          case Some(other) => throw new IllegalArgumentException(
            s"mongodb.options.sidecarUrl must be an http(s) endpoint, got: $other")
          // no sidecar: the dev-harness path — a reference config runs
          // as-is against file dumps under dataDir (MainSpec/ExampleSpec)
          case None => fileAdapters(spark, dataDir) _
        }
      else fileAdapters(spark, dataDir) _
    Runner.fromConfig(spark, config, baseDir, adapters, hooks)
  }

  /** Live wire-read adapters: the reference's collection scan +
    * `local.oplog.rs` tail, served by the [[graft.source.v2
    * .MongoHttpSource]] protocol at `url`. The config's admission
    * budget binds the stream exactly as in the file adapters; the
    * scan-resume and ns/ts predicates reach the server via DSv2
    * filter pushdown. */
  def httpAdapters(spark: SparkSession, url: String)(
      td: TaskDef, opts: Map[String, String]): (DataFrame, DataFrame) = {
    val snapshot = spark.read
      .format("graft.source.v2.MongoHttpSource")
      .option("url", url)
      .option("mode", "snapshot")
      .option("collection", td.extract.ns)
      .options(opts.filter { case (k, _) => k == "numShards" || k == "batchRows" })
      .load()
      .select("id", "doc")
    val stream = spark.readStream
      .format("graft.source.v2.MongoHttpSource")
      .option("url", url)
      .option("mode", "oplog")
      // the P3 ns predicate as a source option: streaming scans get no
      // Catalyst filter pushdown, so the server-side filter is config-
      // driven — the reference's own shape (src/mongodb.ts:46-54)
      .option("ns", td.extract.ns)
      .options(opts.filter { case (k, _) =>
        // startingSeq/startAtHead = the reference's task.from.time first-
        // start position (src/index.ts:27-37); no-ops once checkpointed
        Set("maxRowsPerTrigger", "batchRows", "startingSeq", "startAtHead")(k) })
      .load()
    (snapshot, stream)
  }

  /** File-backed source adapters (harness form of the Mongo connectors):
    * parquet snapshot + JSON-lines oplog stream per task. `dataDir` is
    * resolved through the Hadoop FileSystem layer ([[graft.cdc.StateIO]]),
    * so it may be a cluster URI, same as every other engine path. */
  def fileAdapters(spark: SparkSession, dataDir: String)(
      td: TaskDef, opts: Map[String, String]): (DataFrame, DataFrame) = {
    import graft.cdc.StateIO
    val taskDir = s"$dataDir/${td.name}"
    val root =
      if (StateIO.exists(s"$taskDir/snapshot") ||
        StateIO.exists(s"$taskDir/oplog")) taskDir
      else dataDir
    val snapshot =
      if (StateIO.exists(s"$root/snapshot"))
        spark.read.parquet(s"$root/snapshot").select("id", "doc")
      else graft.cdc.StateStore.empty(spark).select("id", "doc")
    // connection options flow through untouched; the admission budget
    // (maxRowsPerTrigger from readCapacity × trigger) binds the stream
    val stream = spark.readStream
      .format("graft.source.v2.OplogJsonSource")
      .options(opts.filter { case (k, _) => k == "maxRowsPerTrigger" || k == "maxFilesPerTrigger" })
      .option("path", s"$root/oplog")
      .load()
    (snapshot, stream)
  }
}
