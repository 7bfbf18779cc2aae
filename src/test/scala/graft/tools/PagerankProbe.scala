package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch (r19): split sim_pagerank_central's per-invocation cost
  * into plan-construction+optimization vs execution. */
object PagerankProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val fn = graft.SparkEntry.queries("sim_pagerank_central")
    fn(spark, dir).count() // warm sidecars + codegen
    (1 to 5).foreach { _ =>
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis+optimization+physical planning
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      println(f"PHASE build=${(t1 - t0) / 1e9}%.3f plan=${(t2 - t1) / 1e9}%.3f exec=${(t3 - t2) / 1e9}%.3f")
    }
    spark.stop()
  }
}
