package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev scratch: print the exchange/join/agg skeleton of named queries. */
object PlanOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      println(s"========== $name ==========")
      val plan = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
        .queryExecution.executedPlan.toString
      plan.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Exchange") || l.contains("HashAggregate") ||
          l.contains("Expand") || l.contains("Window") || l.contains("Generate"))
        .foreach(l => println(l.take(180)))
    }
    spark.stop()
  }
}
