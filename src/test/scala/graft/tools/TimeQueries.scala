package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: time named harness queries at sf0.1 with the bench's
  * session configs (cold + two warm runs each). */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_pricing_summary")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      (0 to 2).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        println(f"[time] $n%-28s run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
