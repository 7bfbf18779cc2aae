package graft.tools

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only measurement of the Z-order layout's actual IO win: the
  * same selective two-dimensional box predicate, scanned off a
  * z-clustered parquet write vs an insertion-ordered one, comparing
  * BYTES READ (row groups whose min/max rectangle misses the box are
  * never fetched) and scan wall. LayoutSpec proves the min/max spans
  * tighten; this measures what that buys a real scan.
  *
  * Run: SPARK_GRAFT_CPUS=16 sbt "Test/runMain graft.tools.ZorderPruning /root/testdata/sf0.1 64"
  *      args: [sfDir] [nFiles]
  */
object ZorderPruning {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // one row group per ~1 MB so min/max pruning has granularity even
      // at harness scale
      .config("spark.hadoop.parquet.block.size", (1 << 20).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Files.createTempDirectory("zprune").toString
    val li = graft.ops.Tables.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice")
    graft.sink.LayoutWriter.zorderWrite(li, "l_partkey", "l_suppkey",
      s"$base/zorder", nFiles)
    li.repartitionByRange(nFiles, col("l_orderkey"))
      .write.mode("overwrite").parquet(s"$base/insertion")

    // selective box: ~1/16 of each key dimension → ~1/256 of the plane
    val Array(r) = li.agg(
      min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey"))
      .collect()
    val (pmin, pmax, smin, smax) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val (pl, ph) = (pmin + (pmax - pmin) / 2, pmin + (pmax - pmin) / 2 + (pmax - pmin) / 16)
    val (sl, sh) = (smin + (smax - smin) / 2, smin + (smax - smin) / 2 + (smax - smin) / 16)

    val bytes = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        bytes.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    })
    def measure(path: String): (Long, Long, Double) = {
      // warm the FS cache so both layouts measure decode+fetch, not disk
      spark.read.parquet(path).count()
      bytes.set(0L)
      val t0 = System.nanoTime()
      val n = spark.read.parquet(path)
        .filter(col("l_partkey").between(pl, ph) && col("l_suppkey").between(sl, sh))
        .agg(count(lit(1)), sum("l_extendedprice")).collect()(0).getLong(0)
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let straggler TaskEnd events drain into the listener
      (n, bytes.get(), wall)
    }

    // alternate passes so ambient drift hits both layouts equally
    for (pass <- 1 to 3) {
      val (nz, bz, wz) = measure(s"$base/zorder")
      val (ni, bi, wi) = measure(s"$base/insertion")
      require(nz == ni, s"layouts must agree on the answer: $nz vs $ni")
      println(f"[zprune] pass=$pass rows=$nz zorder=${bz / 1e6}%.1f MB ${wz}%.3f s " +
        f"insertion=${bi / 1e6}%.1f MB ${wi}%.3f s  bytes_ratio=${bi.toDouble / bz}%.2f")
    }
    spark.stop()
  }
}
