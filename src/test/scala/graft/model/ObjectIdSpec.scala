package graft.model

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ObjectIdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("hex validation and embedded seconds") {
    assert(ObjectId.isValid("aaaaaaaaaaaaaaaaaaaaaaaa"))
    assert(!ObjectId.isValid("AAAAAAAAAAAAAAAAAAAAAAAA")) // uppercase: not canonical
    assert(!ObjectId.isValid("xyz"))
    assert(!ObjectId.isValid(null))
    // 0x5d000000 = 1560281088
    assert(ObjectId.seconds("5d000000aaaaaaaaaaaaaaaa") === 0x5d000000L)
  }

  test("hex-lexicographic order == embedded-time order (scan resume invariant)") {
    val ids = Seq("5d000001", "5d000000", "5cffffff", "5e123456").map(_ + "a" * 16)
    val byHex = ids.sorted
    val byTime = ids.sortBy(ObjectId.seconds)
    assert(byHex === byTime)
  }

  test("column forms agree with scala forms") {
    import spark.implicits._
    val ids = Seq("5d000000aaaaaaaaaaaaaaaa", "000000018888888888888888")
    val df = ids.toDF("id").select(
      org.apache.spark.sql.functions.col("id"),
      ObjectId.isValidCol(org.apache.spark.sql.functions.col("id")).as("ok"),
      ObjectId.secondsCol(org.apache.spark.sql.functions.col("id")).as("sec"))
    val got = df.collect().map(r => (r.getString(0), r.getBoolean(1), r.getLong(2))).toSeq
    ids.foreach { id =>
      val row = got.find(_._1 == id).get
      assert(row._2 === ObjectId.isValid(id))
      assert(row._3 === ObjectId.seconds(id))
    }
  }
}
