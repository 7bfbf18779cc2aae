package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The spherical k-means loop must improve (never worsen) its cosine
  * objective round over round, and produce a complete, finite codebook
  * — the convergence property that makes the trained centroids safe to
  * feed the IVF index. */
class KMeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("cosine objective is non-decreasing over rounds; codebook stays complete") {
    val (cb, objs) = KMeans.train(spark, "/root/testdata/sf0.01", k = 8, rounds = 3)
    assert(objs.size === 3)
    // assignment rounding permits a 1e-4 per-vector dip (two HALF_UP
    // half-ulps across a near-tie); 500 vectors here
    val eps = 500 * 1e-4
    objs.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - eps, s"objective worsened: $objs")
    }
    assert(objs.last > objs.head - eps)
    val rows = cb.collect()
    assert(rows.length === 8, "no centroid lost its members entirely in 3 rounds")
    rows.foreach { r =>
      val cv = r.getAs[scala.collection.Seq[Double]]("cv")
      assert(cv.length === 64)
      assert(cv.forall(x => !x.isNaN && !x.isInfinite))
      assert(r.getAs[Double]("cn") > 0.0)
    }
  }
}
