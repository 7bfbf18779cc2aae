package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: decompose q11_revenue_concentration cost. */
object Q11Probe {
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
    val li = graft.ops.Tables.table(spark, dir, "lineitem")
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,4)")
    val rev = dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec(col("l_discount")))
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PIECE $tag%-28s min=${ts.min}%.3f med=${ts.sorted.apply(2)}%.3f")
    }
    println("rows=" + li.count())
    time("scan_only")(li.select(col("l_partkey"), col("l_extendedprice"), col("l_discount")))
    time("agg6")(li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(round(sum(rev), 2)))
    time("agg_partkey")(li.groupBy(col("l_partkey")).agg(round(sum(rev), 2).cast("double").as("pv")))
    time("agg_partkey_nodecimal")(li.groupBy(col("l_partkey")).agg(sum(col("l_extendedprice"))))
    time("agg_partkey_spread")(li.repartition(32, col("l_partkey")).groupBy(col("l_partkey")).agg(round(sum(rev), 2).cast("double").as("pv")))
    val perPart = li.groupBy(col("l_partkey")).agg(round(sum(rev), 2).cast("double").as("pv"))
    import org.apache.spark.sql.expressions.Window
    time("full_window")(perPart.withColumn("tv",
      round(sum(dec(col("pv"))).over(Window.partitionBy()), 2).cast("double"))
      .filter(col("pv") > lit(0.0002) * col("tv")))
    spark.stop()
  }
}
