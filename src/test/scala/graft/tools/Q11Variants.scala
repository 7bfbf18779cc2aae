package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q11_revenue_concentration materialization A/B (r13 verdict #1): the
  * driver window moved 5.7x on an unchanged plan, and the hypothesis to
  * test is that the localCheckpoint block-manager write is the
  * IO-sensitive stage. Three variants of the same query:
  *
  *  - checkpoint: the shipping plan — per-part agg localCheckpointed,
  *    total as a second pass over the k checkpointed rows;
  *  - persist:    persist(MEMORY_ONLY) + count() instead of the
  *    localCheckpoint (no disk in the materialization);
  *  - window:     single pass, global total via an empty-frame window
  *    over the k-row aggregate (one Exchange SinglePartition of k rows
  *    — the shape to AVOID at scale, measured here as the control).
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.tools.Q11Variants
  *   /root/testdata/sf0.1 3"
  */
object Q11Variants {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Registry.{dec, rnd}

    def revenueCol =
      dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec(col("l_discount")))
    def perPart: DataFrame =
      spark.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_partkey"))
        .agg(round(sum(revenueCol), 2).cast("double").as("part_value"))
    def finish(pp: DataFrame): DataFrame =
      pp.crossJoin(broadcast(pp
          .agg(round(sum(dec(col("part_value"))), 2).cast("double").as("total_value"))))
        .filter(col("part_value") > lit(0.0002) * col("total_value"))
        .withColumn("share", rnd(col("part_value") / col("total_value"), 6))
        .select(col("l_partkey"), col("part_value"), col("share"))
        .orderBy(col("part_value").desc, col("l_partkey"))

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "checkpoint" -> (() => finish(perPart.localCheckpoint())),
      "persist" -> { () =>
        val pp = perPart.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
        pp.count()
        finish(pp)
      },
      "window" -> { () =>
        val w = org.apache.spark.sql.expressions.Window
          .rowsBetween(Long.MinValue, Long.MaxValue)
        perPart
          .withColumn("total_value",
            round(sum(dec(col("part_value"))).over(w), 2).cast("double"))
          .filter(col("part_value") > lit(0.0002) * col("total_value"))
          .withColumn("share", rnd(col("part_value") / col("total_value"), 6))
          .select(col("l_partkey"), col("part_value"), col("share"))
          .orderBy(col("part_value").desc, col("l_partkey"))
      })

    // warm: page in the fixture + codegen
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    variants.foreach { case (_, f) => f().count() }
    variants.foreach { case (name, f) =>
      val times = (1 to passes).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f().count()
        (System.nanoTime() - t0) / 1e9
      }
      val med = times.sorted.apply(times.size / 2)
      println(f"q11 $name%-11s median=$med%.3f s  passes=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
