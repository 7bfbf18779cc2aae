package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Dev-only streaming-throughput probe: pushes the sf events table,
  * converted to oplog form, through the FULL tail phase (P3 filters →
  * compact → dispatch → LWW MERGE into state) as one Structured
  * Streaming run, and prints events/second end-to-end — the number
  * that compares directly against the reference's 10,000 docs/s
  * read-capacity ceiling (BASELINE.md §1).
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.tools.TailThroughput /root/testdata/sf0.1 [legacy|bucketed]"
  */
object TailThroughput {
  private var buckets: Option[graft.cdc.BucketedStateStore.Spec] = None

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mode = args.lift(1).getOrElse("legacy")
    buckets =
      if (mode == "bucketed") Some(graft.cdc.BucketedStateStore.Spec()) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      // Right-size per-trigger shuffles to BATCH volume, not machine
      // width: a micro-batch's aggregations carry a few MB, and at 32
      // threads the fixed per-task cost of 32-partition shuffle stages
      // dominated the trigger (measured: 85k ev/s at 32 threads vs 211k
      // at 8 on the same 1M events). parallelismFirst=false lets AQE
      // coalesce those batch-side shuffles down to the advisory size —
      // the same knob Bench ships — restoring wide-machine throughput.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Files.createTempDirectory("tail_tp").toString
    // build the oplog projection once: write it, then derive the count
    // and the warm-up slice from the written files
    graft.source.EventsOplog.fromEvents(graft.ops.Tables.events(spark, sfDir))
      .repartition(cpus.toInt).write.parquet(s"$base/in")
    val written = spark.read.parquet(s"$base/in")
    val n = written.count()

    // warm codegen/classloading on a copy of the pipeline so the timed
    // run measures throughput, not one-time JIT (same rationale as Bench)
    val warmBase = Files.createTempDirectory("tail_tp_warm").toString
    written.limit(1000).repartition(1).write.parquet(s"$warmBase/in")
    runOnce(spark, warmBase)

    // >=1 timed runs, an ambient-IO probe point before each (r14
    // verdict #5: throughput numbers are only comparable across windows
    // at similar probe rates — record them alongside, the Bench rule)
    val runs = sys.env.getOrElse("SPARK_GRAFT_TP_RUNS", "1").toInt.max(1)
    (1 to runs).foreach { r =>
      val probe = graft.ops.IoProbe.mbps()
      // fresh state/checkpoint per run: each run is a full cold tail
      val runBase = Files.createTempDirectory(s"tail_tp_run$r").toString
      val t0 = System.nanoTime()
      runOnce(spark, base, runBase)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"metric":"tail_events_per_sec","value":${n / sec}%.0f,"events":$n,"wall_sec":$sec%.3f,"run":$r,"io_probe_mbps":$probe%.1f,"mode":"$mode","sf":"$sfDir"}""")
    }
    spark.stop()
  }

  private def runOnce(spark: SparkSession, base: String,
      stateBase: String = ""): Unit = {
    val sb = if (stateBase.isEmpty) base else stateBase
    val stream = spark.readStream.schema(graft.source.v2.OplogJsonTable.SCHEMA)
      .option("recursiveFileLookup", "true")
      .parquet(s"$base/in")
    val q = graft.pipeline.TailQuery.start(
      stream, graft.SparkEntry.flagshipTask, ns = "app.users", fromTs = 0L,
      stateDir = s"$sb/state", checkpointDir = s"$sb/ckpt",
      triggerMs = 100L, buckets = buckets)
    q.processAllAvailable()
    q.stop()
  }
}
