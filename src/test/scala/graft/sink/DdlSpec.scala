package graft.sink

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.TestSpark
import graft.model.{DObj, DStr, TaskSpec}

class DdlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val task = TaskSpec(
    mapping = Vector("field0.field1" -> "field1", "shareCount.all" -> "shares", "deleted" -> "isDeleted"),
    static = DObj("kind" -> DStr("post")),
  )

  test("output schema: _id + static + mapped dst fields with declared types") {
    val schema = Ddl.outputSchema(task,
      Map("field1" -> "text", "shares" -> "long", "isDeleted" -> "boolean"))
    assert(schema === StructType(Seq(
      StructField("_id", StringType, nullable = false),
      StructField("kind", StringType),
      StructField("field1", StringType),
      StructField("shares", LongType),
      StructField("isDeleted", BooleanType),
    )))
  }

  test("create-if-not-exists with blue/green suffix; idempotent") {
    val loc = java.nio.file.Files.createTempDirectory("ddl").toString
    val name = Ddl.createSinkTable(spark, "sink_posts", task,
      Map("shares" -> "long"), suffix = "v2", location = Some(s"$loc/t"))
    assert(name === "sink_posts_v2")
    assert(Ddl.exists(spark, name))
    // second call is a no-op (IF NOT EXISTS), like the reference's
    // exists -> create (src/indices.ts:19-33)
    assert(Ddl.createSinkTable(spark, "sink_posts", task,
      Map("shares" -> "long"), suffix = "v2", location = Some(s"$loc/t")) === name)
    spark.sql(s"DROP TABLE `$name`")
  }
}
