package graft.tools
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val p = graft.SparkEntry.queries(args(0))(spark, args(1)).queryExecution.executedPlan.toString
    println(p.take(6000))
    spark.stop()
  }
}
