package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.VectorFunctions.{dot => ndot}
import graft.expressions.CellFunctions

/** Recall@3 of the trained-codebook IVF search vs exact cosine top-3,
  * for nProbe in {1, 2, 4} — the BASELINE.md recall table's generator.
  * Usage: Test/runMain graft.tools.IvfRecall [sfDir] */
object IvfRecall {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("ivf-recall").master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = graft.ops.Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("nrm", sqrt(ndot(col("v"), col("v"))))
      .persist()

    val (cbDf, objectives) = graft.llm.KMeans.train(spark, dir, k = 64, rounds = 3)
    val cb = cbDf.select(col("cid").cast("long"), col("cv"), col("cn"))
      .orderBy(col("cid")).collect().toVector
      .map(r => (r.getLong(0), r.getSeq[Double](1).toVector, r.getDouble(2)))
    val cbLit = typedLit(cb)
    println(s"objectives per round: ${objectives.mkString(", ")}")

    def topk(pairs: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
      pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
        .select(col("q_id"), col("n_id"))
    }
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val cand = e.select(col("vec_id").as("n_id"), col("v").as("nv"), col("nrm").as("nn"))
    val exact = topk(cand.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("sim", graft.ops.Registry.rnd(ndot(col("qv"), col("nv")) / (col("qn") * col("nn")), 4)))
      .persist()
    val nExact = exact.count().toDouble

    val assign = e
      .withColumn("cid", CellFunctions.nearestCell(col("v"), col("nrm"), cbLit))
      .select(col("vec_id"), col("cid"), col("v"), col("nrm"))
      .persist()
    Seq(1, 2, 4).foreach { nProbe =>
      val qp = e.filter(col("vec_id") < 8)
        .withColumn("probe", explode(CellFunctions.nearestCells(col("v"), col("nrm"), cbLit, nProbe)))
        .select(col("vec_id").as("q_id"), col("probe"), col("v").as("qv"), col("nrm").as("qn"))
      val approx = topk(assign
        .select(col("vec_id").as("n_id"), col("cid"), col("v").as("nv"), col("nrm").as("nn"))
        .join(broadcast(qp), col("probe") === col("cid") && col("q_id") =!= col("n_id"))
        .withColumn("sim", graft.ops.Registry.rnd(ndot(col("qv"), col("nv")) / (col("qn") * col("nn")), 4)))
      val hit = exact.join(approx, Seq("q_id", "n_id")).count()
      println(f"nProbe=$nProbe recall@3 = ${hit / nExact}%.2f")
    }
    spark.stop()
  }
}
