package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Every registered harness query must run and return rows at sf0.001,
  * and oracle keys must stay aligned with query keys. */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("oracleSql keys are a subset of queries keys") {
    val qk = graft.SparkEntry.queries.keySet
    val ok = graft.SparkEntry.oracleSql.keySet
    assert(ok.subsetOf(qk), s"orphan oracle keys: ${ok.diff(qk)}")
  }

  test("no duplicate query names in the registry") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size === names.size)
  }

  Registry.all.foreach { q =>
    test(s"query ${q.name} runs with rows > 0 at sf0.001") {
      val n = q.fn(spark, dir).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }
}
