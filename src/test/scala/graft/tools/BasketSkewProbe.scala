package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch (r19 verdict #8): skew evidence for the basket pair
  * stage — per-partition row counts of the pair-key exchange, the
  * hottest item's share, and a two-level (salted partial) agg A/B. */
object BasketSkewProbe {
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
      .select(col("l_orderkey"), col("l_partkey"))
    val baskets = graft.ops.Tables.fanOut(li, "l_orderkey")
      .groupBy(col("l_orderkey").as("ok"))
      .agg(collect_set(col("l_partkey")).as("pks"))
    val expanded = baskets
      .select(col("pks"), posexplode(col("pks")).as(Seq("i", "p1")))
      .select(col("p1").as("x"), explode(expr("slice(pks, i + 2, size(pks))")).as("y"))
      .select(least(col("x"), col("y")).as("p1"), greatest(col("x"), col("y")).as("p2"))
    // 1. skew across the pair-key hash exchange: per-partition rows
    val perPart = expanded.repartition(32, col("p1"), col("p2"))
      .select(spark_partition_id().as("pid"))
      .groupBy(col("pid")).count().select(col("count"))
      .collect().map(_.getLong(0)).sorted
    println(s"PAIR-EXCHANGE partitions=${perPart.length} min=${perPart.head} " +
      s"median=${perPart(perPart.length / 2)} max=${perPart.last} " +
      f"maxOverMedian=${perPart.last.toDouble / perPart(perPart.length / 2)}%.2f")
    // 2. hottest single items by posting-list length (drives pair fan-out)
    val hot = baskets.select(explode(col("pks")).as("pk"))
      .groupBy("pk").count().orderBy(col("count").desc).limit(5).collect()
    hot.foreach(r => println(s"HOT-ITEM pk=${r.get(0)} baskets=${r.get(1)}"))
    val nPairs = expanded.count()
    val nKeys = expanded.select(col("p1"), col("p2")).distinct().count()
    println(s"PAIRS rows=$nPairs distinctKeys=$nKeys avgDup=${nPairs.toDouble / nKeys}")
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PIECE $tag%-24s min=${ts.min}%.3f med=${ts.sorted.apply(2)}%.3f")
    }
    // 3. one-level (current) vs two-level (salted) pair aggregation
    time("agg_one_level")(expanded.groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("together")))
    time("agg_two_level")(expanded
      .withColumn("salt", pmod(xxhash64(monotonically_increasing_id()), lit(8)))
      .groupBy(col("p1"), col("p2"), col("salt"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("p1"), col("p2"))
      .agg(sum(col("c")).as("together")))
    spark.stop()
  }
}
