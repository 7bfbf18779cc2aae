package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only micro-bench: time a subset of SparkEntry.queries at a given
  * sf dir, optionally printing the formatted plan. Usage:
  *   Test/runMain graft.tools.SlowBench <sfDir> <n-reps> <name>[,<name>...] [explain]
  */
object SlowBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args(2).split(",").toSeq
    val doExplain = args.length > 3 && args(3) == "explain"
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
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      if (doExplain) fn(spark, sfDir).explain("formatted")
      fn(spark, sfDir).count() // warm
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMING $n%-28s min=${times.min}%.3f med=${times.sorted.apply(times.length / 2)}%.3f")
    }
    spark.stop()
  }
}
