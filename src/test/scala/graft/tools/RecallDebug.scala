package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Debug: is the vec_id<8 gate panel unrepresentatively easy, or does
  * the hard-panel eval have a bug? Computes per-vector recall@3 of the
  * 1-hop beam over the WHOLE corpus as panel, then prints recall by
  * reciprocity decile and the recip-rank of vec 0..7. */
object RecallDebug {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.TestSpark.spark
    val g = graft.llm.KnnGraphStore.loadOrBuild(spark, dir)
    val fwd = g.select(col("src_id"), col("dst_id"))
    val rev = g.select(col("src_id").as("r_dst"), col("dst_id").as("r_src"))
    val recip = fwd.join(rev,
        col("src_id") === col("r_src") && col("dst_id") === col("r_dst"), "left")
      .groupBy(col("src_id"))
      .agg((sum(when(col("r_src").isNotNull, 1.0d).otherwise(0.0d))
        / count(lit(1))).as("recip"))
      .withColumn("rn", row_number().over(Window.orderBy(col("recip"), col("src_id"))))
      .localCheckpoint()
    println("recip of vec 0..7:")
    recip.filter(col("src_id") < 8).orderBy(col("src_id")).show(10, false)
    // full-corpus recall@3, stratified by recip decile
    val n = recip.count().toInt
    val full = graft.llm.SimilarityQueries
      .recallHardOf(spark, dir, hops = 1, width = 8, k = 3,
        panelOverride = Some(graft.llm.SimilarityQueries.hardPanelSlice(spark, dir, 0, n)))
    val byDecile = full.join(recip.withColumnRenamed("src_id", "q_id"), Seq("q_id"))
      .withColumn("decile", ((col("rn") - 1) * 10 / n).cast("int"))
      .groupBy(col("decile"))
      .agg(avg(col("recall")).as("mean_recall"), count(lit(1)).as("n"))
      .orderBy(col("decile"))
    byDecile.show(12, false)
    println("overall mean recall@3: " +
      full.agg(avg(col("recall"))).head().getDouble(0))
    println("vec 0..7 recall@3 via the panelled beam (must be 1.0 = the old gate):")
    full.filter(col("q_id") < 8).orderBy(col("q_id")).show(10, false)
    spark.stop()
  }
}
