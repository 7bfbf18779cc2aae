package graft.transform

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.core.Transformer
import graft.model._

/** The Catalyst-native $set/$unset (withField/dropFields) must agree
  * with the pure core's applyUpdateMongoDoc on the reference golden. */
class StructUpdaterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("withField/dropFields matches applyUpdateMongoDoc golden (T4)") {
    import spark.implicits._
    val task = TaskSpec(Vector("field0.field1" -> "field1", "field0.field2" -> "field2"))

    // fixed-schema twin of the reference fixture doc
    val df = Seq(("aaaaaaaaaaaaaaaaaaaaaaaa", 1L, 2L)).toDF("_id", "f1", "f2")
      .select(col("_id"), struct(col("f1").as("field1"), col("f2").as("field2")).as("field0"))

    // withField/dropFields paths are relative to the struct column, so
    // the mapped src paths (rooted at the doc) lose the "field0." prefix
    val structTask = TaskSpec(task.mapping.map { case (s, d) => s.stripPrefix("field0.") -> d })
    val updated = df.select(col("_id"),
      StructUpdater.applyUpdate(
        col("field0"), structTask,
        set = Map("field1" -> lit("set nested field")),
        unset = Set("field2"),
      ).as("field0"))

    val row = updated.collect().head
    val f0 = row.getStruct(1)
    assert(f0.schema.fieldNames.toSeq === Seq("field1"))
    assert(f0.getString(0) === "set nested field")

    // cross-check against the pure core on the same golden
    val core = Transformer.applyUpdateMongoDoc(
      task,
      DObj("_id" -> DStr("aaaaaaaaaaaaaaaaaaaaaaaa"),
        "field0" -> DObj("field1" -> DInt(1), "field2" -> DInt(2))),
      DObj("field0.field1" -> DStr("set nested field")),
      DObj("field0.field2" -> DInt(1)))
    assert(core === DObj("_id" -> DStr("aaaaaaaaaaaaaaaaaaaaaaaa"),
      "field0" -> DObj("field1" -> DStr("set nested field"))))
  }

  test("withField creates missing nested paths") {
    import spark.implicits._
    val df = Seq((1L)).toDF("x")
      .select(struct(lit(1).as("a")).as("doc"))
      .select(StructUpdater.applySet(col("doc"), "b", lit("new")).as("doc"))
    val row = df.collect().head.getStruct(0)
    assert(row.schema.fieldNames.toSeq === Seq("a", "b"))
    assert(row.getString(1) === "new")
  }
}
