package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The array-producing batched-inference form (the shape a real model
  * integration keeps) and the native IVF assignment's degenerate-input
  * behavior — both outside the DuckDB oracle's reach. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("embedStub: fixed-size per-partition batches, vectors of byte stats") {
    val rows = Multimodal.embedStub(spark, dir, batchSize = 16).collect()
    assert(rows.nonEmpty)
    // every "model call" saw at most batchSize rows, and at least 1
    val sizes = rows.map(_.getAs[Int]("batch_size"))
    assert(sizes.forall(s => s >= 1 && s <= 16))
    // a full batch exists somewhere (documents outnumber 16 per partition)
    assert(sizes.contains(16))
    // 4-dim embedding; first component is the byte length, which for
    // ASCII text equals n_chars
    val byLen = Multimodal.decodeMeta(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("byte_len")).toMap
    rows.take(50).foreach { r =>
      val e = r.getSeq[Float](r.fieldIndex("embedding"))
      assert(e.length === 4)
      assert(e.head === byLen(r.getAs[Long]("doc_id")).toFloat)
    }
  }

  test("decode stub is deterministic in the payload bytes") {
    val a = Multimodal.FakeDecoder.decode(7L, "hello world".getBytes("UTF-8"))
    val b = Multimodal.FakeDecoder.decode(7L, "hello world".getBytes("UTF-8"))
    assert(a === b)
    assert(a.byte_len === 11L)
    assert(a.width >= 64 && a.width < 64 + 1024)
    assert(a.channels >= 1 && a.channels <= 4)
  }

  test("NearestCell ranks non-finite sims below finite ones and never crashes") {
    import graft.expressions.CellMath
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.catalyst.InternalRow
    def arr(xs: Double*): ArrayData = ArrayData.toArrayData(xs.toArray)
    def cell(cid: Long, cv: ArrayData, cn: Double): InternalRow =
      InternalRow(cid, cv, cn)
    val cells = ArrayData.toArrayData(Array[Any](
      cell(0L, arr(1.0, 0.0), 0.0), // zero norm -> sim = Inf/NaN
      cell(5L, arr(0.0, 1.0), 1.0),
      cell(9L, arr(1.0, 0.0), 1.0),
    ))
    // v = (1, 0), nrm = 1: cid 9 has sim 1.0, cid 5 sim 0.0, cid 0 NaN
    assert(CellMath.nearest(arr(1.0, 0.0), 1.0, cells) === 9L)
    // zero-norm input vector: every sim non-finite -> min cid fallback
    assert(CellMath.nearest(arr(0.0, 0.0), 0.0, cells) === 0L)
  }
}
