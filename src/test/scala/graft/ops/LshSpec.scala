package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The LSH prefix-width knob: defaults must stay the calibrated
  * constants (oracle-stable), the one override must reach every
  * prefix-bucketed operator AND its SQL twin, and bitsFor must keep
  * expected bucket occupancy bounded as the corpus grows — the
  * property the fixed widths lose (measured 12.6k → 1.04M candidates
  * for 10× docs at a constant width).
  */
class LshSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def withBits[A](n: Int)(body: => A): A = {
    sys.props("graft.lsh.prefixBits") = n.toString
    try body finally sys.props.remove("graft.lsh.prefixBits")
  }

  test("defaults are the calibrated constants when no override is set") {
    assert(sys.props.get("graft.lsh.prefixBits").isEmpty)
    assert(Lsh.prefixBits(12, 48) === 12)
    assert(Lsh.prefixBits(16, 60) === 16)
  }

  test("the override reaches every operator, clamped to its hash width") {
    withBits(20) {
      assert(Lsh.prefixBits(12, 48) === 20)
      assert(Lsh.prefixBits(16, 60) === 20)
    }
    withBits(99) { assert(Lsh.prefixBits(16, 60) === 60) }
    withBits(0) { assert(Lsh.prefixBits(16, 60) === 1) }
  }

  test("bitsFor keeps expected bucket occupancy bounded as N grows") {
    // unclamped region: N / 2^bits <= target, and the width is not
    // wastefully wide (occupancy > target/2 — one fewer bit would
    // overflow the target)
    for (n <- Seq(10000L, 100000L, 1000000L, 100000000L, 10000000000L)) {
      val bits = Lsh.bitsFor(n, targetBucket = 16L)
      val occ = n.toDouble / (1L << bits)
      assert(occ <= 16.0, s"n=$n bits=$bits occupancy $occ must stay at/under target")
      assert(occ > 8.0 || bits == 8,
        s"n=$n bits=$bits occupancy $occ — one fewer bit should overflow the target")
    }
    // documented anchor points: ~10^4 docs -> 12 bits isn't far off,
    // ~10^6 -> 16, ~10^9 -> 26 at target 16
    assert(Lsh.bitsFor(10000L) === 10)
    assert(Lsh.bitsFor(1000000L) === 16)
    assert(Lsh.bitsFor(1000000000L) === 26)
    // clamps
    assert(Lsh.bitsFor(1L) === 8)
    assert(Lsh.bitsFor(Long.MaxValue / 2, max = 40) === 40)
  }

  test("a wider width changes the bucketing live and the SQL twin tracks it") {
    val defaultBuckets = graft.SparkEntry.queries("dedup_simhash")(spark, dir)
      .select("prefix16").distinct().count()
    withBits(24) {
      val wider = graft.SparkEntry.queries("dedup_simhash")(spark, dir)
        .select("prefix16").distinct().count()
      assert(wider >= defaultBuckets,
        "a wider prefix can only split buckets, never merge them")
      // the SQL twin interpolates the same resolved width, so an
      // overridden run stays oracle-comparable
      assert(graft.SparkEntry.oracleSql("dedup_simhash").contains(s"// ${1L << 36}"))
      assert(graft.SparkEntry.oracleSql("multimodal_phash_pairs").contains(">> 24"))
    }
    // and back to the default after the override is gone
    assert(graft.SparkEntry.oracleSql("dedup_simhash").contains(s"// ${1L << 44}"))
    assert(graft.SparkEntry.oracleSql("multimodal_phash_pairs").contains(">> 36"))
  }
}
