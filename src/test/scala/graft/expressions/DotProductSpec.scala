package graft.expressions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Native dot product must be bitwise-equal to the composable
  * aggregate(zip_with(...)) fold (same sequential summation order). */
class DotProductSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("matches composable fold bitwise on random vectors, incl. nulls") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextGaussian()),
      Seq.fill(64)(rnd.nextGaussian())))
    val df = rows.toDF("a", "b").repartition(3)
      .withColumn("native", VectorFunctions.dot(col("a"), col("b")))
      .withColumn("composable",
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"))
    val bad = df.filter(col("native") =!= col("composable")).count()
    assert(bad === 0L)
    // null array -> null result
    val n = spark.sql("SELECT 1").select(
      VectorFunctions.dot(lit(null).cast("array<double>"), array(lit(1.0))).as("d"))
      .collect().head
    assert(n.isNullAt(0))
  }
}
