package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.llm.CodebookStore

/** Streaming index maintenance: in-distribution batches keep the index
  * healthy; a distribution shift or a hot-cell pileup trips the
  * retrain recommendation. */
class StreamIvfIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  private def vecs = graft.ops.Tables.table(spark, dir, "embeddings")
    .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))

  // The retrain bar comes from the TRAIN-TIME coverage profile (what
  // the offline build measured on its own corpus), not an absolute
  // constant — random high-dim embeddings legitimately sit at modest
  // cosines to their centroids.
  private lazy val trainCov: Double = {
    val cb = CodebookStore.loadOrTrain(spark, dir)
    StreamIvfIndex.assess(
      StreamIvfIndex.applyBatch(StreamIvfIndex.emptyStats(spark), vecs, cb),
      cb.size, minCov = -1.0).meanCov
  }

  test("broadcast codebook delivery produces identical stats to the literal path") {
    val cb = CodebookStore.loadOrTrain(spark, dir)
    def statsRows() = StreamIvfIndex
      .applyBatch(StreamIvfIndex.emptyStats(spark), vecs, cb)
      .orderBy("cid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val lit = statsRows()
    val old = sys.props.get("graft.ivf.bcastThreshold")
    sys.props("graft.ivf.bcastThreshold") = "1"
    try assert(statsRows() === lit,
      "streaming index stats must not depend on codebook delivery mode")
    finally old match {
      case Some(v) => sys.props("graft.ivf.bcastThreshold") = v
      case None    => sys.props.remove("graft.ivf.bcastThreshold")
    }
  }

  test("in-distribution arrivals accumulate healthy per-cell stats across batches") {
    val cb = CodebookStore.loadOrTrain(spark, dir)
    val b1 = vecs.filter(col("vec_id") % 2 === 0)
    val b2 = vecs.filter(col("vec_id") % 2 === 1)
    val s1 = StreamIvfIndex.applyBatch(StreamIvfIndex.emptyStats(spark), b1, cb)
      .localCheckpoint()
    val s2 = StreamIvfIndex.applyBatch(s1, b2, cb).localCheckpoint()
    val total = s2.agg(sum("n")).head().getLong(0)
    assert(total === vecs.count(), "every arrival lands in exactly one cell")
    val d = StreamIvfIndex.assess(s2, cb.size, minCov = trainCov - 0.05)
    assert(!d.retrain, s"in-distribution data must not trip retrain: $d")
    assert(math.abs(d.meanCov - trainCov) < 1e-9,
      s"two batches must reproduce the full-corpus coverage exactly: $d vs $trainCov")
  }

  test("a distribution shift degrades coverage and recommends retraining") {
    val cb = CodebookStore.loadOrTrain(spark, dir)
    // negated vectors: each lands in the cell it was LEAST aligned
    // with (argmax of flipped cosines) — coverage drops well below the
    // train-time profile even though it stays positive in random
    // high-dim data (some centroid is always somewhat anti-aligned)
    val shifted = vecs.withColumn("v", expr("transform(v, x -> -x)"))
    val s = StreamIvfIndex.applyBatch(StreamIvfIndex.emptyStats(spark), shifted, cb)
    val d = StreamIvfIndex.assess(s, cb.size, minCov = trainCov - 0.05)
    assert(d.meanCov < trainCov - 0.05,
      s"shifted arrivals must fall below the train-time profile: $d vs $trainCov")
    assert(d.retrain, s"coverage degradation must recommend retraining: $d")
  }

  test("stats are split-invariant: any micro-batching folds to the full-corpus stats") {
    val cb = CodebookStore.loadOrTrain(spark, dir)
    val whole = StreamIvfIndex.applyBatch(StreamIvfIndex.emptyStats(spark), vecs, cb)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    val rnd = new scala.util.Random(7L)
    for (trial <- 1 to 3) {
      val parts = 2 + rnd.nextInt(3)
      val folded = (0 until parts).foldLeft(StreamIvfIndex.emptyStats(spark)) { (s, p) =>
        StreamIvfIndex.applyBatch(s, vecs.filter(col("vec_id") % parts === p), cb)
          .localCheckpoint()
      }.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
      assert(folded === whole, s"trial $trial ($parts batches) diverged")
    }
  }

  test("a hot-cell pileup trips the skew bound even with good coverage") {
    val cb = CodebookStore.loadOrTrain(spark, dir)
    // one document's embedding arriving en masse: all mass in one cell
    val one = vecs.limit(1)
    val flood = spark.range(200).crossJoin(one).select(col("id").as("vec_id"), col("v"))
    val s = StreamIvfIndex.applyBatch(StreamIvfIndex.emptyStats(spark), flood, cb)
    val d = StreamIvfIndex.assess(s, cb.size)
    assert(d.skew > 4.0 && d.retrain, s"single-cell flood must trip skew: $d")
  }
}
