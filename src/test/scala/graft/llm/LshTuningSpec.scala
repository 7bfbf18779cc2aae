package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Sample-based LSH tuning (the 100 TB form): the S-curve summary a
  * deterministic 50% block sample produces must agree with the
  * full-histogram tuner — same config ranking, close recall and
  * candidate-rate estimates — because the estimator depends on the
  * similarity DISTRIBUTION, not the pair count. Pinned on sf0.01.
  */
class LshTuningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  private def rows(name: String): Map[(Long, Long), (Long, Double, Double)] =
    graft.SparkEntry.queries(name)(spark, dir).collect().map { r =>
      (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3) / r.getLong(2),
          Option(r.get(6)).map(_ => r.getDouble(6)).getOrElse(Double.NaN)))
    }.toMap

  test("sampled S-curve agrees with the full histogram on the shared configs") {
    val full = rows("dedup_lsh_tuning")
    val samp = rows("dedup_lsh_tuning_sampled")
    assert(full.keySet === Set((32L, 4L), (16L, 8L), (8L, 16L)))
    // widened grid: b·r in {64, 128, 256}
    assert(samp.keySet.map { case (b, r) => b * r } === Set(64L, 128L, 256L))
    assert(samp.size === 8)
    // the 50% doc sample keeps roughly a quarter of the pair universe
    val (nFull, nSamp) = (full.head._2._1, samp.head._2._1)
    assert(nSamp > nFull / 8 && nSamp < nFull / 2,
      s"sampled pair universe $nSamp vs full $nFull: not a plausible 50%-doc sample")
    // per shared config: recall and candidate-rate estimates close,
    // and the recall RANKING identical (the decision the tuner feeds)
    val shared = full.keySet
    shared.foreach { k =>
      val (_, candRateF, recF) = full(k)
      val (_, candRateS, recS) = samp(k)
      assert(math.abs(recF - recS) <= 0.05,
        s"config $k recall: full $recF vs sampled $recS")
      assert(math.abs(candRateF - candRateS) <= 0.12,
        s"config $k candidate rate: full $candRateF vs sampled $candRateS")
    }
    val rankF = shared.toSeq.sortBy(k => (-full(k)._3, k))
    val rankS = shared.toSeq.sortBy(k => (-samp(k)._3, k))
    assert(rankF === rankS, "sampled histogram must rank the shared configs identically")
  }

  test("the cached histogram is equivalent to a fresh-session rebuild") {
    val warm = graft.SparkEntry.queries("dedup_lsh_tuning_sampled")(spark, dir)
      .collect().toSeq
    DedupQueries.resetHistCache() // a "restarted session"
    val cold = graft.SparkEntry.queries("dedup_lsh_tuning_sampled")(spark, dir)
      .collect().toSeq
    assert(warm === cold, "cache must be a pure memoization, never a semantic change")
  }

  test("the S-curve is monotone in bands at fixed r (more bands can only catch more)") {
    val samp = rows("dedup_lsh_tuning_sampled")
    for (r <- Seq(4L, 8L, 16L)) {
      val byBands = samp.collect { case ((b, `r`), v) => (b, v._2) }.toSeq.sortBy(_._1)
      assert(byBands.map(_._2) === byBands.map(_._2).sorted,
        s"r=$r: candidate rate must be non-decreasing in bands: $byBands")
    }
  }
}
