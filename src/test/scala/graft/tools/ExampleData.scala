package graft.tools

import java.nio.file.{Files, Paths}

/** Seeds the source-data layout for the examples/ walkthrough
  * (examples/README.md §2) so the shipped config runs out of the box:
  *
  *   sbt "Test/runMain graft.tools.ExampleData /tmp/graft-example-data"
  *   sbt "runMain graft.Main examples/config.json /tmp/graft-example-base /tmp/graft-example-data"
  *
  * Writes the banner task's parquet snapshot + a JSON-lines oplog with
  * one update, one insert and one delete (docs carry the config's
  * `campaign` parent-routing field) — the same fixture ExampleSpec
  * drives through Runner.fromConfig in-test.
  */
object ExampleData {
  def main(args: Array[String]): Unit = {
    val dataDir = args.headOption.getOrElse("/tmp/graft-example-data")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val taskDir = s"$dataDir/app.banners___banner.banner"
    Files.createDirectories(Paths.get(s"$taskDir/oplog"))
    spark.createDataFrame(Seq(
      ("a", """{"_id":"a","name":"spring sale","weight":1.0,"deleted":false,"campaign":"cmp1"}"""),
      ("b", """{"_id":"b","name":"old promo","weight":2.0,"deleted":true,"campaign":"cmp2"}"""),
    )).toDF("id", "doc").write.mode("overwrite").parquet(s"$taskDir/snapshot")
    Files.write(Paths.get(s"$taskDir/oplog/b1.jsonl"), Seq(
      """{"ts":100,"op":"u","ns":"app.banners","id":"a","doc":{"$set":{"weight":2.5}}}""",
      """{"ts":101,"op":"i","ns":"app.banners","id":"c","doc":{"_id":"c","name":"new","weight":3.0,"deleted":false,"campaign":"cmp1"}}""",
      """{"ts":102,"op":"d","ns":"app.banners","id":"b","doc":{"_id":"b"}}""",
    ).mkString("\n").getBytes)
    println(s"example source data written under $dataDir")
    spark.stop()
  }
}
