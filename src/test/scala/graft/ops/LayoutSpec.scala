package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Z-order layout: key correctness, clustering quality, and the real
  * point — a parquet write laid out by the Morton key gives every FILE
  * a tight min/max footprint in BOTH interleaved dimensions, which is
  * what lets footer/row-group pruning skip data for predicates on
  * either column at 100 TB.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  /** Reference Morton interleave in plain Scala. */
  private def mortonRef(qp: Int, qs: Int): Long =
    (0 until 8).map { i =>
      (((qp >> i) & 1).toLong << (2 * i + 1)) | (((qs >> i) & 1).toLong << (2 * i))
    }.sum

  test("morton key matches the reference interleave and keeps the prefix property") {
    import spark.implicits._
    val pairs = for (qp <- 0 until 256 by 17; qs <- 0 until 256 by 13) yield (qp, qs)
    val got = pairs.toDF("qp", "qs")
      .withColumn("z", expr(Layout.mortonExpr("qp", "qs", "div")))
      .as[(Int, Int, Long)].collect()
    got.foreach { case (qp, qs, z) =>
      assert(z === mortonRef(qp, qs), s"($qp,$qs)")
      // prefix property: truncating one bit of each dimension truncates
      // two bits of z — i.e. z-ranges ARE quantized rectangles, the
      // invariant file pruning relies on
      assert(z >> 2 === mortonRef(qp >> 1, qs >> 1), s"prefix ($qp,$qs)")
    }
  }

  /** Reference 3-D Morton in plain Scala (dim 0 most significant per
    * bit group, matching mortonExprN). */
  private def mortonRef3(a: Int, b: Int, c: Int): Long =
    (0 until 8).map { i =>
      (((a >> i) & 1).toLong << (3 * i + 2)) |
        (((b >> i) & 1).toLong << (3 * i + 1)) |
        (((c >> i) & 1).toLong << (3 * i))
    }.sum

  test("3-dim morton matches the reference interleave and keeps the prefix property") {
    import spark.implicits._
    val triples = for (a <- 0 until 256 by 37; b <- 0 until 256 by 41; c <- 0 until 256 by 43)
      yield (a, b, c)
    val got = triples.toDF("qa", "qb", "qc")
      .withColumn("z", expr(Layout.mortonExprN(Seq("qa", "qb", "qc"), "div")))
      .as[(Int, Int, Int, Long)].collect()
    got.foreach { case (a, b, c, z) =>
      assert(z === mortonRef3(a, b, c), s"($a,$b,$c)")
      assert(z >> 3 === mortonRef3(a >> 1, b >> 1, c >> 1), s"prefix ($a,$b,$c)")
    }
  }

  test("a 3-dim z-sorted write tightens per-file min/max on ALL three dims") {
    val base = java.nio.file.Files.createTempDirectory("layout3").toString
    val li = Tables.table(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
    graft.sink.LayoutWriter.zorderedN(li,
        Seq("l_partkey", "l_suppkey", "l_orderkey"), nFiles = 64)
      .write.mode("overwrite").parquet(s"$base/z3")
    li.repartitionByRange(64, col("l_linenumber"))
      .write.mode("overwrite").parquet(s"$base/ins")
    def spans(path: String): (Double, Double, Double) = {
      val r = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max("l_partkey") - min("l_partkey")).as("ps"),
          (max("l_suppkey") - min("l_suppkey")).as("ss"),
          (max("l_orderkey") - min("l_orderkey")).as("os"))
        .agg(avg("ps"), avg("ss"), avg("os")).head()
      (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    }
    val (zp, zs, zo) = spans(s"$base/z3")
    val (ip, is, io_) = spans(s"$base/ins")
    // 64 files over a 3-dim key = 2 prefix bits per dim -> each file's
    // rectangle should cover well under half of each dim's range;
    // linenumber order is uncorrelated with all three -> full spans
    assert(zp < ip * 0.6 && zs < is * 0.6 && zo < io_ * 0.6,
      s"3-dim z spans ($zp,$zs,$zo) must tighten vs insertion ($ip,$is,$io_)")
  }

  test("z buckets bound both dimensions; insertion buckets bound neither") {
    val rows = graft.SparkEntry.queries("layout_zorder_stats")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    def avgSpans(layout: String): (Double, Double) = {
      val b = rows.filter(_._1 == layout)
      // weight by rows so empty/tiny buckets don't skew the mean
      val n = b.map(_._2).sum.toDouble
      (b.map(r => r._3 * r._2).sum / n, b.map(r => r._4 * r._2).sum / n)
    }
    val (zp, zs) = avgSpans("zorder")
    val (ip, is) = avgSpans("insertion")
    // 64 z-buckets = 3 prefix bits per dimension → ideal span 31 of 255.
    // Insertion order is uncorrelated with part/supp → spans ~255.
    assert(zp < 40 && zs < 40, s"z spans ($zp, $zs) should be near the 31 ideal")
    assert(ip > 4 * zp && is > 4 * zs,
      s"insertion spans ($ip, $is) should dwarf z spans ($zp, $zs)")
  }

  test("a z-sorted parquet write yields per-file min/max tight in both key dims") {
    val base = java.nio.file.Files.createTempDirectory("layout").toString
    val li = Tables.table(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    graft.sink.LayoutWriter.zorderWrite(
      li, "l_partkey", "l_suppkey", s"$base/zorder", nFiles = 64)
    li.repartitionByRange(64, col("l_orderkey"))
      .write.mode("overwrite").parquet(s"$base/insertion")

    def fileSpans(path: String): (Double, Double) = {
      val r = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max("l_partkey") - min("l_partkey")).as("ps"),
          (max("l_suppkey") - min("l_suppkey")).as("ss"))
        .agg(avg("ps"), avg("ss")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    assert(spark.read.parquet(s"$base/zorder").columns.toSet ===
      Set("l_orderkey", "l_partkey", "l_suppkey"),
      "layout helper columns must never reach the files")
    val (zp, zs) = fileSpans(s"$base/zorder")
    val (ip, is) = fileSpans(s"$base/insertion")
    // Both dimensions must tighten substantially — single-column sorts
    // can only ever tighten one. (64 files → ~1/8 of the key range per
    // file per dimension; leave slack for range-partition skew.)
    assert(zp < ip / 4, s"partkey file span: zorder $zp vs insertion $ip")
    assert(zs < is / 4, s"suppkey file span: zorder $zs vs insertion $is")
  }
}
