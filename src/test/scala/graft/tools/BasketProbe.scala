package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: decompose join_basket_affinity cost at sf0.1. */
object BasketProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PIECE $tag%-24s min=${ts.min}%.3f med=${ts.sorted.apply(2)}%.3f")
    }
    val li = graft.ops.Tables.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val baskets = graft.ops.Tables.fanOut(li, "l_orderkey")
      .groupBy(col("l_orderkey").as("ok"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("pks"))
    time("baskets")(baskets)
    time("freq")(baskets.select(explode(col("pks")).as("pk"))
      .groupBy(col("pk")).agg(count(lit(1)).as("cnt")))
    val expanded = baskets
      .select(col("pks"), posexplode(col("pks")).as(Seq("i", "p1")))
      .select(col("p1"), explode(expr("slice(pks, i + 2, size(pks))")).as("p2"))
    time("pairs_agg")(expanded.groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("together")))
    time("pairs_top")(expanded.groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("together"))
      .orderBy(col("together").desc, col("p1"), col("p2")).limit(100))
    // baskets without sort_array / without set
    time("baskets_nosort")(graft.ops.Tables.fanOut(li, "l_orderkey")
      .groupBy(col("l_orderkey").as("ok"))
      .agg(collect_set(col("l_partkey")).as("pks")))
    time("full_query")(graft.SparkEntry.queries("join_basket_affinity")(spark, dir))
    spark.stop()
  }
}
