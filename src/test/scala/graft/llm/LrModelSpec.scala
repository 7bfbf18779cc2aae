package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The trained quality classifier: per-round loss must be
  * non-increasing (up to the 6-dp quantization grain), training must
  * reach the weight fixpoint inside the round budget, a restarted
  * session must load the sidecar (zero retrain jobs), and the trained
  * model must calibrate no worse than the one-step seed weights.
  */
class LrModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("per-round loss is non-increasing and training converges") {
    val (w, losses) = LrModel.loadOrTrainWithLosses(spark, dir)
    assert(w.size === 4)
    assert(losses.size >= 2, s"must train more than one round: $losses")
    losses.sliding(2).foreach { case Seq(a, b) =>
      // each recorded loss is mean6-quantized; a legitimate dip from
      // quantization alone is bounded by one grain
      assert(b <= a + 1e-6, s"loss increased: $losses")
    }
    assert(losses.last < losses.head, s"training must actually improve: $losses")
    // behaviorally converged: the loss tail is flat (within a few 6-dp
    // grains per round) even if the budget stop fired before the
    // strict quantized fixpoint
    assert(losses.size <= 40, s"round budget overrun: ${losses.size}")
    val tailDelta = losses(losses.size - 2) - losses.last
    assert(tailDelta <= 1e-5, s"loss still moving at budget end: $tailDelta")
    // and the bulk of the improvement landed early (a real convergence
    // curve, not a linear crawl)
    val half = losses(losses.size / 2)
    assert(losses.head - half >= 0.8 * (losses.head - losses.last),
      s"improvement not front-loaded: head=${losses.head} half=$half last=${losses.last}")
  }

  test("restart loads the sidecar: zero retrain jobs, identical weights") {
    val (w1, _) = LrModel.loadOrTrainWithLosses(spark, dir)
    val t0 = LrModel.trainCount
    val (w2, _) = LrModel.loadOrTrainWithLosses(spark, dir)
    assert(LrModel.trainCount === t0, "second session must NOT retrain")
    assert(w1 === w2)
  }

  test("trained calibration is no worse than the seed-weight calibration") {
    def meanAbsGap(name: String): Double = {
      val rows = graft.SparkEntry.queries(name)(spark, dir).collect()
      // weight each bin's |gap| by its population — the aggregate
      // calibration error the model is trained to reduce
      val n = rows.map(_.getLong(1)).sum
      rows.map(r => math.abs(r.getDouble(4)) * r.getLong(1)).sum / n
    }
    val seed = meanAbsGap("eval_calibration_bins")
    val trained = meanAbsGap("eval_calibration_trained")
    assert(trained <= seed + 1e-9,
      s"trained model must not calibrate worse: trained=$trained seed=$seed")
  }
}
