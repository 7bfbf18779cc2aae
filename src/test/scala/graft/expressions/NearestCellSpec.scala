package graft.expressions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Edge semantics of the IVF cell expressions the sf-scale oracles
  * cannot reach: rank ties, non-finite similarities (zero-norm vectors
  * or centroids), and probe counts beyond the codebook. */
class NearestCellSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cells(cs: (Long, Seq[Double], Double)*) =
    typedLit(cs.map { case (cid, cv, cn) => (cid, cv, cn) })
      .cast("array<struct<cid:bigint,cv:array<double>,cn:double>>")

  test("nearest_cells returns rank order, cid-ascending on exact ties") {
    // v = (1, 0): cosine 1.0 with c1/c4 (tie -> lower cid first), 0 with c2
    val df = Seq((Seq(1.0, 0.0), 1.0)).toDF("v", "nrm")
      .select(CellFunctions.nearestCells(col("v"), col("nrm"),
        cells((4L, Seq(2.0, 0.0), 2.0), (1L, Seq(1.0, 0.0), 1.0), (2L, Seq(0.0, 1.0), 1.0)), 3).as("p"))
    assert(df.head.getSeq[Long](0) === Seq(1L, 4L, 2L))
  }

  test("p beyond the codebook yields every cell once; p=1 matches nearest_cell") {
    val cb = cells((7L, Seq(1.0, 0.0), 1.0), (3L, Seq(0.0, 1.0), 1.0))
    val df = Seq((Seq(0.5, 0.5), math.sqrt(0.5))).toDF("v", "nrm")
      .select(
        CellFunctions.nearestCells(col("v"), col("nrm"), cb, 10).as("all"),
        CellFunctions.nearestCells(col("v"), col("nrm"), cb, 1).as("one"),
        CellFunctions.nearestCell(col("v"), col("nrm"), cb).as("argmax"))
    val r = df.head
    assert(r.getSeq[Long](0).sorted === Seq(3L, 7L))
    assert(r.getSeq[Long](1) === Seq(r.getLong(2)))
  }

  test("non-finite sims rank below every finite sim, min-cid among themselves") {
    // zero-norm centroid (cn = 0) -> NaN sim for cids 9 and 5
    val cb = cells((9L, Seq(1.0, 0.0), 0.0), (2L, Seq(0.0, 1.0), 1.0), (5L, Seq(1.0, 1.0), 0.0))
    val df = Seq((Seq(1.0, 0.0), 1.0)).toDF("v", "nrm")
      .select(
        CellFunctions.nearestCells(col("v"), col("nrm"), cb, 3).as("p"),
        CellFunctions.nearestCell(col("v"), col("nrm"), cb).as("best"))
    val r = df.head
    assert(r.getSeq[Long](0) === Seq(2L, 5L, 9L), "finite first, then min-cid among non-finite")
    assert(r.getLong(1) === 2L)
  }

  test("codegen and interpreted paths agree") {
    val cb = cells((1L, Seq(1.0, 0.0), 1.0), (2L, Seq(0.0, 1.0), 1.0), (3L, Seq(-1.0, 0.0), 1.0))
    val rows = Seq.tabulate(50)(i => (Seq(math.cos(i * 0.13), math.sin(i * 0.13)), 1.0))
    val df = rows.toDF("v", "nrm").repartition(3)
      .select(CellFunctions.nearestCells(col("v"), col("nrm"), cb, 2).as("p"))
    val gen = df.collect().map(_.getSeq[Long](0))
    // force the interpreted path by evaluating on the driver via a local relation with codegen off
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = rows.toDF("v", "nrm").repartition(3)
        .select(CellFunctions.nearestCells(col("v"), col("nrm"), cb, 2).as("p"))
        .collect().map(_.getSeq[Long](0))
      assert(gen.toSeq === interp.toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
