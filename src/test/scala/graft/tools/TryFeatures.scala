package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: does this Spark build support recursive CTEs / lateral? */
object TryFeatures {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tryq(label: String, sql: String): Unit =
      try println(s"[try] $label OK: " + spark.sql(sql).collect().take(3).mkString(";"))
      catch { case e: Exception =>
        println(s"[try] $label FAIL: ${Option(e.getMessage).getOrElse(e.toString).take(200)}") }
    tryq("recursive_cte",
      """WITH RECURSIVE r(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM r WHERE n < 5)
        |SELECT sum(n) FROM r""".stripMargin)
    spark.range(5).createOrReplaceTempView("t5")
    tryq("lateral_subquery",
      """SELECT t.id, l.m FROM t5 t,
        |LATERAL (SELECT max(id) AS m FROM t5 WHERE id <= t.id) l""".stripMargin)
    tryq("lateral_correlated_limit",
      """SELECT t.id, l.id2 FROM t5 t,
        |LATERAL (SELECT id AS id2 FROM t5 WHERE id < t.id ORDER BY id DESC LIMIT 2) l""".stripMargin)
    spark.stop()
  }
}
