package graft.tools

/** Dev scratch: print the executed plan of named queries (args) at
  * sf0.001 for plan-shape inspection. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    args.foreach { name =>
      println(s"===== $name =====")
      println(graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
