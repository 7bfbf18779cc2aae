package graft.transform

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.TestSpark
import graft.model.{DObj, DStr, TaskSpec}

/** The fixed-schema (Catalyst select) form of the mapping transform:
  * rename, nested dst reconstruction, static seeding, parent routing. */
class ColumnMapperSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("project: rename + nested dst + static + parent") {
    import spark.implicits._
    val df = Seq((1L, "alice", 10L, 2L)).toDF("_id", "name", "count", "grp")
    val task = TaskSpec(
      mapping = Vector("name" -> "userName", "count" -> "stats.n", "grp" -> "stats.g"),
      static = DObj("kind" -> DStr("user")),
      parent = Some("grp"))
    val out = ColumnMapper.project(df, task)
    assert(out.columns.toSeq === Seq("id", "kind", "userName", "stats", "parent"))
    val row = out.collect().head
    assert(row.getAs[String]("id") === "1")
    assert(row.getAs[String]("kind") === "user")
    assert(row.getAs[String]("userName") === "alice")
    val stats = row.getStruct(row.fieldIndex("stats"))
    assert(stats.getAs[Long]("n") === 10L)
    assert(stats.getAs[Long]("g") === 2L)
    assert(row.getAs[Long]("parent") === 2L)
  }

  test("projectAsIR produces the IR shape") {
    import spark.implicits._
    val df = Seq((7L, "x", 42L)).toDF("_id", "name", "ts_sec")
    val task = TaskSpec(Vector("name" -> "name"))
    val out = ColumnMapper.projectAsIR(df, task, tsCol = Some("ts_sec"))
    assert(out.columns.toSeq === Seq("action", "id", "data", "parent", "timestamp"))
    val row = out.collect().head
    assert(row.getAs[String]("action") === "upsert")
    assert(row.getAs[String]("id") === "7")
    assert(row.getAs[Long]("timestamp") === 42L)
  }

  test("deep nested dst paths group by shared prefix in order") {
    val cols = ColumnMapper.nest(Seq(
      "a.x" -> col("c1"), "b" -> col("c2"), "a.y.z" -> col("c3")))
    // two top-level outputs: a (struct with x, y.z) and b
    assert(cols.length === 2)
  }

  test("nest fails fast on conflicting flat vs nested dst paths") {
    // either order: a column must never be silently discarded
    intercept[IllegalArgumentException](
      ColumnMapper.nest(Seq("a" -> col("c1"), "a.b" -> col("c2"))))
    intercept[IllegalArgumentException](
      ColumnMapper.nest(Seq("a.b" -> col("c2"), "a" -> col("c1"))))
  }
}
