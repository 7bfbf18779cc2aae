package graft.tools
import org.apache.spark.sql.SparkSession
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("cdc_resume_scan", "q1_pricing_summary", "join_broadcast_part_revenue", "q5_regional_revenue", "sim_cosine_topk")) {
      println(s"========== $name ==========")
      val plan = graft.SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      // summarize: scans with pushed filters, join types, codegen spans
      plan.linesIterator.filter(l =>
        l.contains("PushedFilters") || l.contains("ReadSchema") || l.contains("Join") ||
        l.contains("WholeStageCodegen") || l.contains("Exchange") || l.contains("HashAggregate")
      ).take(25).foreach(l => println(l.take(220)))
    }
    spark.stop()
  }
}
