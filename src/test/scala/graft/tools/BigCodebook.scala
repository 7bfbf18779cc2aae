package graft.tools

/** Dev probe for the round-10 wall removal: with the kFor cap raised,
  * train a genuinely-larger-than-64-cell codebook (sf1: 20k vectors →
  * |C| = √N ≈ 142) that crosses the broadcast threshold, and run the
  * IVF search + recall evaluation through the broadcast-relation
  * delivery path end to end.
  *
  * Run: sbt "Test/runMain graft.tools.BigCodebook /tmp/sf1 256 100"
  *      args: [sfDir] [kCap] [bcastThreshold]
  */
object BigCodebook {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    sys.props("graft.ivf.kCap") = args.lift(1).getOrElse("256")
    sys.props("graft.ivf.bcastThreshold") = args.lift(2).getOrElse("100")
    val spark = graft.TestSpark.spark
    val n = graft.ops.Tables.table(spark, dir, "embeddings").count()
    val k = graft.llm.CodebookStore.kFor(n)
    println(s"""{"probe":"big_codebook","n":$n,"k":$k,"threshold":${graft.llm.SimilarityQueries.broadcastThreshold}}""")
    val t0 = System.nanoTime()
    val assign = graft.llm.SimilarityQueries.ivfAssignment(spark, dir)
    val plan = assign.queryExecution.executedPlan.toString
    val mode =
      if (plan.contains("BroadcastExchange")) "broadcast"
      else "literal"
    val cells = assign.select("cid").distinct().count()
    println(s"""{"probe":"big_codebook","mode":"$mode","cells_used":$cells,"assign_sec":${(System.nanoTime() - t0) / 1e9}}""")
    require(mode == "broadcast", s"expected broadcast delivery at k=$k")
    val t1 = System.nanoTime()
    val recall = graft.SparkEntry.queries("sim_recall_eval")(spark, dir).collect()
    val avg = recall.map(_.getDouble(3)).sum / recall.length
    println(s"""{"probe":"big_codebook","recall_rows":${recall.length},"avg_recall":$avg,"eval_sec":${(System.nanoTime() - t1) / 1e9}}""")
    sys.props.remove("graft.ivf.kCap")
    sys.props.remove("graft.ivf.bcastThreshold")
    spark.stop()
  }
}
