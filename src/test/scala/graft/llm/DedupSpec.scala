package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Decision-level semantics for the dedup operators whose hash parity
  * lives in the driver's DuckDB compare: substring-window dedup on
  * synthetic docs with known shared runs, and the structural invariants
  * of near-dup cluster resolution.
  */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, dir)

  // ten shared tokens -> with K=8, windows at starts 1..3 of the run are
  // identical across docs 1 and 2; doc 3 shares nothing
  private val sharedRun = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
  private def synth = {
    import spark.implicits._
    Seq(
      (1L, s"unique one two $sharedRun tail1 tail2"),
      (2L, s"other prefix words here $sharedRun different ending"),
      (3L, "totally fresh content with no overlap at all whatsoever in any window"),
    ).toDF("doc_id", "text")
  }

  test("substring spans: shared K-token runs are found and merged, non-shared docs emit none") {
    val spans = DedupQueries.substringSpansOf(synth).collect()
    val byDoc = spans.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.contains(1L) && byDoc.contains(2L))
    assert(!byDoc.contains(3L), "doc 3 shares no window")
    // doc 1: shared run spans tokens 4..13 (1-based); dup windows start
    // at 4..6 and merge into ONE span [4, 14)
    val d1 = byDoc(1L)
    assert(d1.length === 1, s"overlapping windows must merge: ${d1.toSeq}")
    assert(d1.head.getAs[Long]("span_start") === 4L)
    assert(d1.head.getAs[Long]("span_end_excl") === 14L)
    assert(d1.head.getAs[Long]("n_windows") === 3L)
  }

  test("substring frac: covers every doc, flags only docs with cross-doc windows") {
    val rows = DedupQueries.substringFracGate(synth)
      .orderBy("doc_id").collect()
    assert(rows.length === 3)
    assert(rows(0).getAs[Long]("n_dup") === 3L)
    assert(rows(1).getAs[Long]("n_dup") === 3L)
    assert(rows(2).getAs[Long]("n_dup") === 0L)
    assert(rows(2).getAs[Boolean]("keep") === true)
    // a doc dominated by shared content is dropped
    import spark.implicits._
    val pair = Seq(
      (1L, sharedRun), (2L, s"$sharedRun"),
    ).toDF("doc_id", "text")
    val gated = DedupQueries.substringFracGate(pair).orderBy("doc_id").collect()
    assert(gated.forall(_.getAs[Double]("dup_frac") === 1.0))
    assert(gated.forall(_.getAs[Boolean]("keep") === false))
  }

  test("substring frac: sub-K-word docs get an explicit keep=true row") {
    import spark.implicits._
    val short = Seq((7L, "too short for any window")).toDF("doc_id", "text")
    val r = DedupQueries.substringFracGate(short).head()
    assert(r.getAs[Long]("n_windows") === 0L)
    assert(r.isNullAt(r.fieldIndex("dup_frac")))
    assert(r.getAs[Boolean]("keep") === true)
  }

  test("triangle audit: oriented enumeration equals brute force over the pair graph; wedge algebra holds") {
    val edges = run("dedup_minhash_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = edges.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    // brute force: count unordered triples with all three edges present
    val bruteTri = edges.toSeq.map { case (a, b) =>
      adj(a).count(c => c > b && edges.contains((b, c)) && edges.contains((a, c)))
    }.sum.toLong
    val wedges = adj.values.map(ns => ns.size.toLong * (ns.size - 1) / 2).sum
    val row = run("dedup_graph_triangles").collect()
    assert(row.length == 1)
    val r = row.head
    assert(r.getLong(0) == adj.size.toLong, "n_nodes")
    assert(r.getLong(1) == edges.size.toLong, "n_edges")
    assert(r.getLong(2) == adj.values.map(_.size).max.toLong, "max_degree")
    assert(r.getLong(3) == wedges, "n_wedges")
    assert(r.getLong(4) == bruteTri, s"n_triangles ${r.getLong(4)} vs brute $bruteTri")
    assert(3 * bruteTri <= wedges, "triangle-wedge inequality")
    if (wedges > 0) {
      val t = BigDecimal(3.0 * bruteTri / wedges)
        .setScale(8, BigDecimal.RoundingMode.HALF_UP)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(5) - t) < 1e-9, "transitivity")
    } else assert(r.isNullAt(5), "degenerate transitivity")
    assert(bruteTri > 0, "fixture dup graph has at least one closed cluster")
  }

  test("cluster resolution: component = min member id, exactly one canonical per component") {
    val rows = run("dedup_cluster_canonical").collect()
    assert(rows.nonEmpty)
    val byComp = rows.groupBy(_.getAs[Long]("component"))
    byComp.foreach { case (comp, members) =>
      assert(members.map(_.getAs[Long]("doc_id")).min === comp,
        s"component label must be the min member id (component $comp)")
      assert(members.count(_.getAs[Boolean]("is_canonical")) === 1,
        s"exactly one canonical survivor in component $comp")
    }
    // canonical iff the doc IS the component label
    rows.foreach { r =>
      assert(r.getAs[Boolean]("is_canonical") ===
        (r.getAs[Long]("doc_id") === r.getAs[Long]("component")))
    }
  }

  test("star contraction labels every node identically to min-label propagation") {
    // two independent CC algorithms over the same candidate pairs must
    // agree exactly — the O(log n) star variant earns its place only if
    // its labeling is indistinguishable from the O(diameter) one
    val prop = run("dedup_cluster_canonical").collect()
    val star = run("dedup_cluster_star").collect()
    assert(star.length === prop.length)
    assert(star.map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq ===
      prop.map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq)
  }

  test("capped containment pairs are a subset of the uncapped pairs (recall loss one-sided)") {
    // the df cap can only DROP pairs (set sizes stay uncapped, inter
    // only shrinks) — it must never invent a pair the exact form lacks
    def ids(name: String) = run(name).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = ids("dedup_containment_capped")
    val full = ids("dedup_containment_pairs")
    assert(capped.nonEmpty, "cap=64 must leave signal at fixture scale")
    assert(capped.subsetOf(full),
      s"capped invented pairs: ${capped.diff(full).take(5)}")
  }

  test("embedding pairs: the block-size contract is enforced, not just documented") {
    val e = DedupQueries.embeddingsWithUnit(spark, dir)
      .withColumn("block", org.apache.spark.sql.functions.col("label"))
    // a bound below the largest label block must abort with remediation
    val ex = intercept[IllegalStateException] {
      DedupQueries.blockedPairs(e, threshold = 0.4, maxBlock = 1L).collect()
    }
    assert(ex.getMessage.contains("quadratic per block"))
    assert(ex.getMessage.contains("dedup_embedding_pairs_lsh"))
    // and the default bound admits the harness blocks: query still runs
    assert(run("dedup_embedding_pairs").limit(1).count() >= 0)
  }
}
