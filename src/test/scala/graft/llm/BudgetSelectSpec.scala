package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The binned budget selection must equal the global-sort greedy it
  * claims to replace: for random corpora, take docs by (score desc,
  * doc_id) while the running token sum fits the budget — the binned
  * algorithm (level prefix + per-level running sums) must select
  * exactly that set, with the boundary level split identically. */
class BudgetSelectSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("binned selection equals global-sort greedy on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 5) {
      val n = 200 + rnd.nextInt(300)
      // few score levels -> crowded boundary level (the hard case)
      val docs = (0 until n).map { i =>
        (i.toLong, (1 + rnd.nextInt(50)).toLong, (rnd.nextInt(7) * 0.125))
      }
      val denom = 2 + rnd.nextInt(4)

      // independent model: one global sort + running take
      val budget = docs.map(_._2).sum / denom
      var acc = 0L
      val takenByModel = docs.sortBy { case (id, _, sc) => (-sc, id) }
        .takeWhile { case (_, w, _) => { acc += w; acc <= budget } }
      // per-level expected (taken_docs, taken_tokens)
      val expected = takenByModel.groupBy(_._3).map { case (sc, ds) =>
        sc -> ((ds.size.toLong, ds.map(_._2).sum))
      }

      val got = CurationQueries.budgetSelectFrom(
          docs.toDF("doc_id", "n_words", "score"), denom)
        .collect()
        .map(r => r.getDouble(0) -> ((r.getLong(3), r.getLong(4))))
        .filter(_._2._1 > 0).toMap
      assert(got === expected,
        s"trial $trial (n=$n denom=$denom budget=$budget) diverged from global greedy")
    }
  }
}
