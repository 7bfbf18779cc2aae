package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch seeder for driving the MigrateState CLI live: writes a tiny
  * legacy SCD2 history at args(0). */
object SeedLegacyScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    import spark.implicits._
    val t = new graft.streaming.StreamScd2.Scd2Table(spark, args(0))
    t.applyIfNew(Seq((1L, "a", 10L, 1L)).toDF("key", "attr", "sec", "event_id"), 0L)
    t.applyIfNew(Seq((1L, "b", 20L, 2L)).toDF("key", "attr", "sec", "event_id"), 1L)
    println(s"seeded legacy at ${args(0)} lastBatchId=${t.lastBatchId}")
    spark.stop()
  }
}
