package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe for the hardened recall panel: sweep beam budgets at
  * a given recall depth over the production strided panel, print the
  * mean — the BASELINE.md recall-vs-budget surface. */
object HardPanelProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = graft.TestSpark.spark
    for ((hops, width, sp) <- Seq((1, 8, 1), (2, 4, 1), (2, 8, 1),
           (1, 8, 2), (2, 16, 2), (1, 8, 4), (1, 8, 8), (2, 16, 8))) {
      val df = graft.llm.SimilarityQueries
        .recallHardOf(spark, dir, hops, width, k, sp)
        .agg(avg(col("recall")).as("mean"), min(col("recall")).as("min"))
        .head()
      println(f"k=$k hops=$hops width=$width%2d seed=$sp mean=${df.getDouble(0)}%.4f min=${df.getDouble(1)}%.3f")
    }
    spark.stop()
  }
}
