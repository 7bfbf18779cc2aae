package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The trained BPE tokenizer sidecar: restart = zero retrain, merges
  * deterministic, weighted token totals strictly non-increasing as
  * merges apply, and round 1's choice IS text_bpe_merge_step's
  * oracle-checked rank-1 pair.
  */
class BpeModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("training converges under budget; totals strictly non-increasing") {
    val (merges, totals) = BpeModel.loadOrTrainWithTotals(spark, dir)
    assert(merges.nonEmpty && merges.size <= BpeModel.mergeBudget)
    assert(totals.size === merges.size)
    totals.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a, s"token total must not increase: $a -> $b")
      case _         => ()
    }
    // every merge is a distinct new token
    assert(merges.map { case (a, b) => a + b }.distinct.size === merges.size)
  }

  test("round 1 equals text_bpe_merge_step's rank-1 pair") {
    val (merges, _) = BpeModel.loadOrTrainWithTotals(spark, dir)
    val step = graft.SparkEntry.queries("text_bpe_merge_step")(spark, dir)
      .filter(org.apache.spark.sql.functions.col("rank") === 1)
      .head().getString(1) // "a b"
    assert(s"${merges.head._1} ${merges.head._2}" === step,
      "the first trained merge must be the oracle-checked step's top pair")
  }

  test("restart loads the sidecar: zero retrain jobs, identical merges") {
    val (m1, _) = BpeModel.loadOrTrainWithTotals(spark, dir)
    val t0 = BpeModel.trainCount
    val (m2, _) = BpeModel.loadOrTrainWithTotals(spark, dir)
    assert(BpeModel.trainCount === t0, "restart must NOT retrain")
    assert(m1 === m2)
  }

  test("tokenization is exact: applying all merges to a word re-derives its token count") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val (merges, _) = BpeModel.loadOrTrainWithTotals(spark, dir)
    // a word made of the first merge's pair twice: greedy left-to-right
    val (a, b) = merges.head
    val w = a + b + a + b
    val n = Seq(w).toDF("w")
      .select(BpeModel.tokenCount(
        BpeModel.applyMerges(BpeModel.encode(col("w")), merges.take(1))).as("n"))
      .head().getInt(0)
    assert(n === 2, s"'$w' under merge ($a,$b) must be 2 tokens, got $n")
  }
}
