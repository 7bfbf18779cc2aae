package graft.expressions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The native expressions must be reachable as SQL functions through
  * the session extension, and agree with their Column-API forms. */
class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("dot_product is SQL-callable and matches the Column form") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val sqlResult = spark.sql("SELECT dot_product(a, b) AS d FROM vecs")
      .collect().head.getDouble(0)
    val colResult = df.select(VectorFunctions.dot(col("a"), col("b")).as("d"))
      .collect().head.getDouble(0)
    assert(sqlResult === 32.0)
    assert(sqlResult === colResult)
  }

  test("json_all_keys_dollar is SQL-callable and matches the Column form") {
    import spark.implicits._
    val df = Seq(
      """{"$set":{"a":1},"$unset":{"b":1}}""",
      """{"a":1,"$set":{"b":2}}""",
    ).toDF("doc")
    df.createOrReplaceTempView("docs")
    val sql = spark.sql("SELECT json_all_keys_dollar(doc) AS x FROM docs")
      .collect().map(_.getBoolean(0)).toSeq
    assert(sql === Seq(true, false))
    val col0 = df.select(functions.json_all_keys_dollar(col("doc")).as("x"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(sql === col0)
  }

  test("SQL-registered expressions stay inside whole-stage codegen") {
    // a file-backed scan, so the projection cannot constant-fold away
    graft.ops.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .selectExpr("transform(embedding, x -> cast(x AS double)) AS v")
      .createOrReplaceTempView("cg")
    val plan = spark.sql("SELECT dot_product(v, v) FROM cg")
      .queryExecution.executedPlan.toString
    // '*(n)' prefixes a WholeStageCodegen subtree in the abbreviated
    // plan string — the dot_product projection must carry it
    val line = plan.linesIterator.find(_.contains("dot_product")).get
    assert(line.trim.startsWith("*("), plan)
  }
}
