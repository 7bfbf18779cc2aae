package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The broadcast-codebook delivery path (|C| > broadcastThreshold)
  * must be a pure plan-shape change: identical assignments and query
  * results to the literal path, with the corpus side never shuffled.
  * This is the round-10 removal of the |C| <= 64 literal-projection
  * wall — at |C| ≈ √N = 31k (a 1e9-vector corpus) the literal would
  * serialize ~16 MB of centroids into every task's plan copy; the
  * broadcast relation ships once per executor instead.
  */
class CodebookPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.1"

  private def withThreshold[T](t: Int)(f: => T): T = {
    val old = sys.props.get("graft.ivf.bcastThreshold")
    sys.props("graft.ivf.bcastThreshold") = t.toString
    try f
    finally old match {
      case Some(v) => sys.props("graft.ivf.bcastThreshold") = v
      case None    => sys.props.remove("graft.ivf.bcastThreshold")
    }
  }

  test("broadcast-path results are identical to literal-path on sf0.1") {
    for (name <- Seq("sim_ivf_topk", "sim_ivf_multiprobe", "sim_recall_eval",
        "sample_kcenter_step")) {
      val lit = graft.SparkEntry.queries(name)(spark, dir).collect().toSeq
      val bc = withThreshold(1)(
        graft.SparkEntry.queries(name)(spark, dir).collect().toSeq)
      assert(lit == bc, s"$name diverged between literal and broadcast codebook")
    }
  }

  test("broadcast assignment keeps the corpus side exchange-free") {
    val p = withThreshold(1)(
      SimilarityQueries.ivfAssignment(spark, dir)
        .queryExecution.executedPlan.toString)
    // the codebook arrives via ONE broadcast of a single local row;
    // the corpus flows scan -> project with no shuffle of any kind
    assert(p.contains("BroadcastExchange"), p.take(1200))
    assert(!p.contains("Exchange hashpartitioning"), p.take(1200))
    assert(!p.contains("Exchange rangepartitioning"), p.take(1200))
    assert(!p.contains("Exchange SinglePartition"), p.take(1200))
    assert(p.contains("nearest_cell"), "assignment must stay the native projection")
  }

  test("kcenter centroid lookup plans a BroadcastHashJoin on cid above the threshold") {
    val p = withThreshold(1)(
      graft.SparkEntry.queries("sample_kcenter_step")(spark, dir)
        .queryExecution.executedPlan.toString)
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("Exchange hashpartitioning"), p.take(1200))
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
  }

  test("literal path stays join-free below the threshold") {
    val p = SimilarityQueries.ivfAssignment(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p.take(1200))
    assert(!p.contains("Exchange"), p.take(1200))
  }
}
