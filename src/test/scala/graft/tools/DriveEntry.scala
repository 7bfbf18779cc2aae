package graft.tools
import org.apache.spark.sql.SparkSession
object DriveEntry {
  def main(args: Array[String]): Unit = {
    // replicate the driver's smoke-check environment
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"entry rows=$n in ${(System.nanoTime()-t0)/1e9}%.2f s")
    df.show(5, false)
    // probe: deterministic across two runs?
    val h1 = df.collect().map(_.toString).sorted.mkString.hashCode
    val h2 = graft.SparkEntry.entry(spark).collect().map(_.toString).sorted.mkString.hashCode
    println(s"probe deterministic rerun: ${h1 == h2}")
    spark.stop()
  }
}
