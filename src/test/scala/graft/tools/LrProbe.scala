package graft.tools
import org.apache.spark.sql.SparkSession
object LrProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (w, losses) = graft.llm.LrModel.loadOrTrainWithLosses(spark, "/root/testdata/sf0.001")
    println("weights=" + w)
    println("losses=" + losses.mkString(","))
    spark.stop()
  }
}
