package graft.expressions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The native LSH signature must be bitwise-equal to the interpreted
  * aggregate/transform/zip_with fold it replaced (same dot-product
  * summation order, same strict `> 0` sign test). */
class SignBitsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("sign_bits matches the composable lambda fold on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val planes = Seq.fill(16)(Seq.fill(8)(rnd.nextGaussian()))
    val rows = Seq.fill(300)(Seq.fill(8)(rnd.nextGaussian()))
    val df = rows.toDF("v").repartition(3)
      .withColumn("planes", typedLit(planes))
      .withColumn("native", SignFunctions.signBits(col("v"), typedLit(planes)))
      .withColumn("composable", expr(
        """aggregate(
          |  transform(planes, p -> if(aggregate(zip_with(v, p, (x, y) -> x * y), 0D, (acc, x) -> acc + x) > 0D, 1, 0)),
          |  (0L, 0),
          |  (acc, b) -> (acc.col1 + if(b = 1, shiftleft(1L, acc.col2), 0L), acc.col2 + 1),
          |  acc -> acc.col1)""".stripMargin))
    assert(df.filter(col("native") =!= col("composable")).count() === 0L)
    // null vector -> null signature
    val n = spark.sql("SELECT 1").select(
      SignFunctions.signBits(lit(null).cast("array<double>"),
        typedLit(Seq(Seq(1.0)))).as("s")).collect().head
    assert(n.isNullAt(0))
  }

  test("sign_bits rejects more than 64 planes instead of silently wrapping the shift") {
    import spark.implicits._
    val planes = Seq.fill(65)(Seq(1.0))
    val df = Seq(Seq(1.0)).toDF("v")
      .select(SignFunctions.signBits(col("v"), typedLit(planes)).as("s"))
    val e = intercept[Exception] { df.collect() }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(c => c +: causes(c.getCause))
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => c.getMessage != null && c.getMessage.contains("at most 64 hyperplanes")),
      s"expected the 64-plane guard, got: $e")
  }

  test("element_sign_bits matches the per-element when() chain") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // include exact zeros and negatives: bit only for strictly positive
    val rows = Seq.fill(300)(Seq.fill(8)(rnd.nextInt(5) - 2.0))
    val composable = (0 until 8)
      .map(i => when(element_at(col("v"), i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    val df = rows.toDF("v").repartition(3)
      .withColumn("native", SignFunctions.elementSignBits(col("v"), 8))
      .withColumn("composable", composable)
    assert(df.filter(col("native") =!= col("composable")).count() === 0L)
    // n beyond the array length just stops at the end
    val short = Seq(Seq(1.0, -1.0)).toDF("v")
      .select(SignFunctions.elementSignBits(col("v"), 8).as("s"))
      .collect().head.getLong(0)
    assert(short === 1L)
  }
}
