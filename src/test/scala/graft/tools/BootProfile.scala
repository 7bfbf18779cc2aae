package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiler for eval_bootstrap_ci's stages (round 16): times
  * (a) the text-split quality score alone, (b) score + weight array,
  * (c) the exploded replicate aggregation, (d) the registered query.
  */
object BootProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.TestSpark.spark
    val docs = graft.ops.Tables.table(spark, dir, "documents")
    def time(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$name%-28s pass$i ${(System.nanoTime() - t0) / 1e9}%.3f s (n=$n)")
      }
    }
    val scored = docs
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("n_stop", expr(
        "size(filter(ws, w -> w IN ('the','a','and','of','to','in')))").cast("long"))
      .withColumn("v", (lit(0.5) * least(col("n_words").cast("double") / 100.0, lit(1.0)) +
        lit(0.5) * (lit(1.0) - round(col("n_stop").cast("double") / col("n_words"), 3)))
        .cast("decimal(6,3)"))
    time("score only")(scored.agg(sum(col("v"))).count())
    val cuts = Seq(790015084L, 1580030168L, 1975037710L, 2106706891L,
      2139624186L, 2146207645L, 2147304888L, 2147461637L, 2147481231L)
    val cutsArr = cuts.mkString("array(", "L, ", "L)")
    val withWts = scored
      .withColumn("hp", expr(
        "cast(conv(substring(md5(cast(doc_id AS string)), 1, 8), 16, 10) AS bigint) % 2147483647"))
      .withColumn("wts", expr(
        s"""transform(sequence(0, 31), b -> size(filter($cutsArr,
           |  c -> (hp * ((1099087573L * (b + 1)) % 2147483647L) + b) % 2147483647L >= c)))""".stripMargin))
    time("score + weights")(withWts.agg(sum(expr("aggregate(wts, 0L, (a, x) -> a + x)"))).count())
    time("exploded agg")(withWts
      .select(col("v"), posexplode(col("wts")).as(Seq("b", "w")))
      .groupBy(col("b")).agg(sum(col("w") * col("v"))).count())
    time("exploded agg (pre-select)")(withWts
      .select(col("v"), col("wts"))
      .select(col("v"), posexplode(col("wts")).as(Seq("b", "w")))
      .groupBy(col("b")).agg(sum(col("w") * col("v"))).count())
    val pinned = withWts.select(col("v"), col("wts")).localCheckpoint()
    time("exploded agg (pinned)")(pinned
      .select(col("v"), posexplode(col("wts")).as(Seq("b", "w")))
      .groupBy(col("b")).agg(sum(col("w") * col("v"))).count())
    withWts.select(col("v"), posexplode(col("wts")).as(Seq("b", "w")))
      .groupBy(col("b")).agg(sum(col("w") * col("v"))).explain("formatted")
    time("lc alone")(withWts.select(col("v"), col("wts")).localCheckpoint().count())
    time("persist+count alone") {
      val p = withWts.select(col("v"), col("wts"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      val n = p.count(); p.unpersist(); n
    }
    time("rdd cache alone") {
      val r = withWts.select(col("v"), col("wts")).queryExecution.toRdd
        .map(_.copy()).persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      val n = r.count(); r.unpersist(); n
    }
    time("lc + exploded agg") {
      val p = withWts.select(col("v"), col("wts")).localCheckpoint()
      p.select(col("v"), posexplode(col("wts")).as(Seq("b", "w")))
        .groupBy(col("b")).agg(sum(col("w") * col("v"))).count()
    }
    val withWtsPar = docs.repartition(spark.sparkContext.defaultParallelism)
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("n_stop", expr(
        "size(filter(ws, w -> w IN ('the','a','and','of','to','in')))").cast("long"))
      .withColumn("v", (lit(0.5) * least(col("n_words").cast("double") / 100.0, lit(1.0)) +
        lit(0.5) * (lit(1.0) - round(col("n_stop").cast("double") / col("n_words"), 3)))
        .cast("decimal(6,3)"))
      .withColumn("hp", expr(
        "cast(conv(substring(md5(cast(doc_id AS string)), 1, 8), 16, 10) AS bigint) % 2147483647"))
      .withColumn("wts", expr(
        s"""transform(sequence(0, 31), b -> size(filter($cutsArr,
           |  c -> (hp * ((1099087573L * (b + 1)) % 2147483647L) + b) % 2147483647L >= c)))""".stripMargin))
    time("lc repartitioned")(withWtsPar.select(col("v"), col("wts")).localCheckpoint().count())
    time("registered query")(graft.SparkEntry.queries("eval_bootstrap_ci")(spark, dir).count())
    spark.stop()
  }
}
