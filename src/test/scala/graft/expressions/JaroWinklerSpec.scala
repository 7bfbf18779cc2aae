package graft.expressions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins [[JaroWinkler]] to the textbook Winkler variant as DuckDB 1.0
  * implements it (`jaro_winkler_similarity` — the oracle twin of
  * join_fuzzy_match). Every expected value below was read DIRECTLY from
  * DuckDB 1.0 on this box; a drift in either engine breaks the pin. */
class JaroWinklerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def jw(a: String, b: String): Double = StringSim.jaroWinkler(a, b)

  test("textbook values match DuckDB jaro_winkler_similarity") {
    val eps = 1e-12
    // classic Winkler paper pairs
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < eps)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-10)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-10)
    assert(math.abs(jw("JONES", "JOHNSON") - 0.8323809523809523) < eps)
    // boost threshold: jaro = 0.6 <= 0.7 so the 4-char common prefix
    // must NOT boost (DuckDB reads 0.6, an unconditional boost reads 0.76)
    assert(jw("abcdxxxxxx", "abcdyyyyyy") === 0.6)
    // transposition counting (half the out-of-order matched pairs)
    assert(math.abs(jw("abab", "baba") - 0.8333333333333334) < eps)
    assert(math.abs(jw("CRATE", "TRACE") - 0.7333333333333334) < eps)
    // empty-side convention: DuckDB returns 0.0, including both-empty
    assert(jw("abc", "") === 0.0)
    assert(jw("", "") === 0.0)
    assert(jw("a", "b") === 0.0)
    // identity and single-char window clamp (floor(len/2)-1 < 0 -> 0)
    assert(jw("a", "a") === 1.0)
    assert(jw("AL", "AL") === 1.0)
    assert(math.abs(jw("aa", "ab") - 0.6666666666666666) < eps)
    // longer real-shape pair
    assert(math.abs(jw("hello world", "hello wrold") - 0.9818181818181818) < eps)
  }

  test("expression evaluates in codegen and interpreted modes, null-intolerant") {
    import spark.implicits._
    val df = Seq(("cold widget", "old widget"), ("MARTHA", "MARHTA"))
      .toDF("a", "b")
      .select(StringSimFunctions.jaroWinkler(col("a"), col("b")).as("jw"))
    val got = df.collect().map(_.getDouble(0)).sorted
    assert(math.abs(got(0) - 0.9611111111111111) < 1e-12)
    assert(math.abs(got(1) - 0.9696969696969697) < 1e-12)
    // SQL-surface registration via GraftExtensions
    val viaSql = spark.sql("SELECT jaro_winkler('MARTHA', 'MARHTA') AS jw")
      .collect().head.getDouble(0)
    assert(math.abs(viaSql - 0.9611111111111111) < 1e-12)
    // null in -> null out
    val n = Seq(("x", "y")).toDF("a", "b")
      .select(StringSimFunctions.jaroWinkler(lit(null).cast("string"), col("b")).as("jw"))
      .collect().head
    assert(n.isNullAt(0))
  }

  test("symmetric and bounded on random strings") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcdef"
    def s(): String = Seq.fill(rnd.nextInt(10))(alpha(rnd.nextInt(alpha.length))).mkString
    (1 to 500).foreach { _ =>
      val (x, y) = (s(), s())
      val v = jw(x, y)
      assert(v >= 0.0 && v <= 1.0, s"out of range: $x/$y -> $v")
      assert(v === jw(y, x), s"asymmetric: $x/$y")
      if (x == y && x.nonEmpty) assert(v === 1.0)
    }
  }
}
