package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import scala.jdk.CollectionConverters._

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

  test("trained-codebook IVF beats a recall floor at nProbe=1 (the wiring's point)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.expressions.VectorFunctions.{dot => ndot}
    import graft.expressions.CellFunctions
    val dir = "/root/testdata/sf0.01"
    val (cbDf, _) = KMeans.train(spark, dir, k = 64, rounds = 3, computeObjective = false)
    val cb = cbDf.select(col("cid").cast("long"), col("cv"), col("cn"))
      .orderBy(col("cid")).collect().toVector
      .map(r => (r.getLong(0), r.getSeq[Double](1).toVector, r.getDouble(2)))
    val cbLit = typedLit(cb)
    val e = graft.ops.Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("nrm", sqrt(ndot(col("v"), col("v"))))
    def topk(pairs: org.apache.spark.sql.DataFrame) = {
      val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
      pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
        .select(col("q_id"), col("n_id"))
    }
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val cand = e.select(col("vec_id").as("n_id"), col("v").as("nv"), col("nrm").as("nn"))
    val sim = graft.ops.Registry.rnd(ndot(col("qv"), col("nv")) / (col("qn") * col("nn")), 4)
    val exact = topk(cand.join(broadcast(q), col("q_id") =!= col("n_id")).withColumn("sim", sim))
    val assign = e.withColumn("cid", CellFunctions.nearestCell(col("v"), col("nrm"), cbLit))
    val approx = topk(assign
      .select(col("vec_id").as("n_id"), col("cid"), col("v").as("nv"), col("nrm").as("nn"))
      .join(broadcast(assign.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("cid").as("qcid"), col("v").as("qv"), col("nrm").as("qn"))),
        col("qcid") === col("cid") && col("q_id") =!= col("n_id"))
      .withColumn("sim", sim))
    val nExact = exact.count().toDouble
    val hit = exact.join(approx, Seq("q_id", "n_id")).count()
    // deterministic on fixed data/seeds (measured 0.88 at sf0.1, and
    // well above the untrained codebook's 0.21); the floor guards the
    // training-to-index wiring, not the exact figure
    assert(hit / nExact >= 0.5, s"recall@3 collapsed: ${hit / nExact} ($hit/$nExact)")
  }

  test("codebook persists: a restarted session loads the file bit-identically, no retrain") {
    val dir = "/root/testdata/sf0.01"
    val indexDir = java.nio.file.Files.createTempDirectory("ivf-index").toString
    val prev = sys.props.get("graft.index.dir")
    sys.props("graft.index.dir") = indexDir
    try {
      // session 1: cold — trains once and persists
      val t0 = CodebookStore.trainCount
      val first = CodebookStore.loadOrTrain(spark, dir)
      assert(CodebookStore.trainCount == t0 + 1)
      // √N sizing: 500 embeddings at sf0.01 → k = ceil(√500) = 23
      assert(first.size == CodebookStore.kFor(500))
      assert(first.size == 23)
      val files = java.nio.file.Files.list(java.nio.file.Paths.get(indexDir))
      try assert(files.iterator().asScala.exists(_.getFileName.toString.startsWith("codebook_")))
      finally files.close()
      // "restart": nothing in memory, only the index file survives
      SimilarityQueries.resetCodebookCacheForTest()
      val second = CodebookStore.loadOrTrain(spark, dir)
      assert(CodebookStore.trainCount == t0 + 1, "restart must NOT retrain")
      // bit-identical centroids → bit-identical cell assignments
      assert(second == first)
      // stale-corpus guard: a file whose header count disagrees with
      // the live corpus must be ignored and retrained over
      val cbFile = {
        val s = java.nio.file.Files.list(java.nio.file.Paths.get(indexDir))
        try s.iterator().asScala.find(_.getFileName.toString.startsWith("codebook_")).get
        finally s.close()
      }
      val lines = java.nio.file.Files.readAllLines(cbFile)
      lines.set(0, "#corpus_stamp=499:0")
      java.nio.file.Files.write(cbFile, lines)
      SimilarityQueries.resetCodebookCacheForTest()
      val third = CodebookStore.loadOrTrain(spark, dir)
      assert(CodebookStore.trainCount == t0 + 2, "stale codebook must retrain")
      assert(third == first) // deterministic training: same data, same result
    } finally {
      prev match {
        case Some(v) => sys.props("graft.index.dir") = v
        case None    => sys.props.remove("graft.index.dir")
      }
      SimilarityQueries.resetCodebookCacheForTest()
    }
  }
}
