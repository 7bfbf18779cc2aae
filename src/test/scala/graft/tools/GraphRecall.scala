package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall@3 of the graph-refined beam search vs plain IVF at nProbe 1
  * and 2 — the index-quality acceptance table for the k-NN graph
  * sidecar (BASELINE.md records the output like the recall-vs-nProbe
  * table). Ground truth is exact cosine top-3 over the corpus.
  *
  * Usage: sbt "Test/runMain graft.tools.GraphRecall /root/testdata/sf0.1"
  */
object GraphRecall {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def topSet(name: String): Map[Long, Set[Long]] =
      graft.SparkEntry.queries(name)(spark, dir)
        .collect().groupBy(_.getLong(0))
        .map { case (q, rows) => q -> rows.map(_.getLong(2)).toSet }

    // exact ground truth: brute-force top-3 (sim_cosine_topk is exactly
    // that query over the same 8-query panel)
    val truth = topSet("sim_cosine_topk")
    val legs = Seq(
      "ivf nProbe=1" -> topSet("sim_ivf_topk"),
      "ivf nProbe=2" -> topSet("sim_ivf_multiprobe"),
      "graph beam  " -> topSet("sim_graph_topk"))
    println(f"${"method"}%-14s mean_recall@3   per-query hits")
    legs.foreach { case (name, got) =>
      val hits = truth.toSeq.sortBy(_._1).map { case (q, t) =>
        (got.getOrElse(q, Set.empty) & t).size
      }
      val recall = hits.sum.toDouble / (3.0 * truth.size)
      println(f"$name%-14s $recall%.4f          ${hits.mkString(",")}")
    }
    spark.stop()
  }
}
