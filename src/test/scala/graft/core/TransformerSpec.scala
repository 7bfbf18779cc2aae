package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.model._

/** 1:1 port of the reference's golden unit tests
  * (reference test/processor.test.ts:1-130). Fixtures from FIXTURES.md §A.
  */
class TransformerSpec extends AnyFunSuite {
  val id = "aaaaaaaaaaaaaaaaaaaaaaaa"

  // test/processor.test.ts:8-23
  val oplogU = Oplog(
    ts = BsonTs(1495012567, 14),
    op = "u",
    ns = "db0.collection0",
    o = DObj(
      "$set" -> DObj("field0.field1" -> DStr("set nested field")),
      "$unset" -> DObj("field0.field2" -> DInt(1)),
    ),
    o2 = Some(DObj("_id" -> DStr(id))),
  )

  // test/processor.test.ts:25-50
  val task = TaskSpec(Vector("field0.field1" -> "field1", "field0.field2" -> "field2"))
  val task2 = TaskSpec(Vector("field0.field3" -> "field3"))

  // test/processor.test.ts:52-64
  val mongoDoc = DObj(
    "_id" -> DStr(id),
    "field0" -> DObj("field1" -> DInt(1), "field2" -> DInt(2)),
  )
  val esDoc = DObj("_id" -> DStr(id), "field1" -> DInt(1), "field2" -> DInt(2))

  test("transformer create/update (test/processor.test.ts:66-92)") {
    val ir = Transformer.transformer(task, "upsert", mongoDoc)
    assert(ir === Some(IR(
      "upsert", id,
      Some(DObj("field1" -> DInt(1), "field2" -> DInt(2))),
      None, 0L)))
  }

  test("transformer delete (test/processor.test.ts:94-102)") {
    val ir = Transformer.transformer(task, "delete", mongoDoc)
    assert(ir === Some(IR("delete", id, None, None, 0L)))
  }

  test("applyUpdateMongoDoc (test/processor.test.ts:104-112)") {
    val set = DObj("field0.field1" -> DStr("set nested field"))
    val unset = DObj("field0.field2" -> DInt(1))
    val got = Transformer.applyUpdateMongoDoc(task, mongoDoc, set, unset)
    assert(got === DObj(
      "_id" -> DStr(id),
      "field0" -> DObj("field1" -> DStr("set nested field")),
    ))
  }

  test("applyUpdateESDoc (test/processor.test.ts:114-120)") {
    val set = DObj("field0.field1" -> DStr("set nested field"))
    val unset = DObj("field0.field2" -> DInt(1))
    val got = Transformer.applyUpdateESDoc(task, esDoc, set, unset)
    assert(got === DObj("_id" -> DStr(id), "field1" -> DStr("set nested field")))
  }

  test("ignoreUpdate true (test/processor.test.ts:122-125)") {
    assert(Transformer.ignoreUpdate(task2, oplogU) === true)
  }

  test("ignoreUpdate false (test/processor.test.ts:127-130)") {
    assert(Transformer.ignoreUpdate(task, oplogU) === false)
  }

  test("transformer static seed + parent extraction (src/processor.ts:61,77,86)") {
    val t = TaskSpec(
      mapping = Vector("field0.field1" -> "f1"),
      static = DObj("kind" -> DStr("konst")),
      parent = Some("field0.field2"),
    )
    val ir = Transformer.transformer(t, "upsert", mongoDoc, Some(BsonTs(42, 7)))
    assert(ir === Some(IR(
      "upsert", id,
      Some(DObj("kind" -> DStr("konst"), "f1" -> DInt(1))),
      Some(DInt(2)), 42L)))
  }

  test("transformer empty output -> None (P5, src/processor.ts:79-81)") {
    val t = TaskSpec(Vector("nope" -> "nope"))
    assert(Transformer.transformer(t, "upsert", mongoDoc) === None)
  }

  test("transformer isESDoc re-aims mapping keys (T2, src/processor.ts:69-71)") {
    val ir = Transformer.transformer(task, "upsert", esDoc, isESDoc = true)
    assert(ir === Some(IR(
      "upsert", id,
      Some(DObj("field1" -> DInt(1), "field2" -> DInt(2))),
      None, 0L)))
  }
}
