package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The trained NB language-ID sidecar: restart = zero training jobs,
  * the persisted model is bit-identical to a from-scratch training
  * pass, and a corpus-stamp change invalidates (no silent reuse).
  */
class NbModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def modelSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1),
      r.getDecimal(2).toPlainString)).toSet

  test("restart loads the sidecar: zero retrains, identical model + consts") {
    val (m1, c1) = NbModel.loadOrTrain(spark, dir)
    val t0 = NbModel.trainCount
    CorpusStamp.reset() // simulate a fresh session (stamp re-derives)
    val (m2, c2) = NbModel.loadOrTrain(spark, dir)
    assert(NbModel.trainCount === t0, "restart must NOT retrain")
    assert(c1 === c2)
    assert(modelSet(m1) === modelSet(m2))
  }

  test("persisted model is exactly the from-scratch training pass") {
    val (loaded, loadedConsts) = NbModel.loadOrTrain(spark, dir)
    val (fresh, freshConsts) = NbModel.train(spark, dir)
    assert(loadedConsts === freshConsts)
    assert(modelSet(loaded) === modelSet(fresh),
      "sidecar (l, w, lnp) must equal a fresh derivation bit-for-bit")
  }

  test("consts cover every seed language, 6-dp decimals, negative priors") {
    val (_, consts) = NbModel.loadOrTrain(spark, dir)
    assert(consts.nonEmpty && consts.size <= 25, "bounded |L| frame")
    assert(consts.map(_.l) === consts.map(_.l).sorted, "lang-ordered")
    consts.foreach { c =>
      assert(c.lnprior.scale === 6 && c.lnz.scale === 6)
      assert(c.lnprior.doubleValue <= 0.0, "ln of a probability")
      assert(c.lnz.doubleValue > 0.0, "ln(N_l + V) of counts >= 1")
    }
  }

  test("scoring path runs zero training jobs once the sidecar is warm") {
    NbModel.loadOrTrain(spark, dir) // ensure warm
    val t0 = NbModel.trainCount
    val out = graft.SparkEntry.queries("text_nb_langid")(spark, dir)
    assert(out.count() > 0)
    assert(NbModel.trainCount === t0,
      "query invocation must score from the sidecar, not retrain")
  }
}
