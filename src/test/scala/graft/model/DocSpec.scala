package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** Path/merge/JSON semantics of the dynamic-document model — pins the
  * lodash-compatibility rules the reference relies on (literal-dotted-key
  * precedence, truthiness, deep merge; see Doc.scala scaladoc).
  */
class DocSpec extends AnyFunSuite {
  test("get nested path") {
    val d = DObj("a" -> DObj("b" -> DInt(1)))
    assert(Paths.get(d, "a.b") === Some(DInt(1)))
    assert(Paths.get(d, "a.c") === None)
    assert(Paths.get(d, "x.y") === None)
  }

  test("parse rejects malformed literals and trailing garbage") {
    // misspelled literals must not be consumed positionally
    intercept[IllegalArgumentException](Json.parse("truE"))
    intercept[IllegalArgumentException](Json.parse("falsy"))
    intercept[IllegalArgumentException](Json.parse("nil!"))
    // trailing content after the top-level value is corruption, not noise
    intercept[IllegalArgumentException](Json.parse("""{"a":1} extra"""))
    intercept[IllegalArgumentException](Json.parse("""[1,2]3"""))
    // well-formed values (with surrounding whitespace) still parse
    assert(Json.parse(" true ") === DBool(true))
    assert(Json.parse("null") === DNull)
    assert(Json.parse("""{"a":false}""") === DObj("a" -> DBool(false)))
  }

  test("literal dotted key wins over nested traversal (lodash castPath)") {
    val d = DObj("a.b" -> DInt(7), "a" -> DObj("b" -> DInt(1)))
    assert(Paths.get(d, "a.b") === Some(DInt(7)))
    val set = Paths.set(d, "a.b", DInt(9))
    assert(set.get("a.b") === Some(DInt(9)))
    assert(Paths.get(set, "a") === Some(DObj("b" -> DInt(1))))
  }

  test("set creates intermediate objects") {
    val d = Paths.set(DObj.empty, "a.b.c", DStr("x"))
    assert(d === DObj("a" -> DObj("b" -> DObj("c" -> DStr("x")))))
  }

  test("set overwrites preserving key position") {
    val d = DObj("k1" -> DInt(1), "k2" -> DInt(2))
    assert(Paths.set(d, "k1", DInt(9)).keys === Vector("k1", "k2"))
  }

  test("unset removes leaf; no-op on missing") {
    val d = DObj("a" -> DObj("b" -> DInt(1), "c" -> DInt(2)))
    assert(Paths.unset(d, "a.b") === DObj("a" -> DObj("c" -> DInt(2))))
    assert(Paths.unset(d, "a.z") === d)
    assert(Paths.unset(d, "z.z") === d)
  }

  test("array index traversal") {
    val d = DObj("a" -> DArr(DInt(1), DObj("b" -> DInt(2))))
    assert(Paths.get(d, "a.1.b") === Some(DInt(2)))
    assert(Paths.get(d, "a.0") === Some(DInt(1)))
    assert(Paths.get(d, "a.5") === None)
  }

  test("merge: scalars overwritten, objects recursive, arrays index-wise") {
    val a = DObj("x" -> DInt(1), "o" -> DObj("p" -> DInt(1), "q" -> DInt(2)), "arr" -> DArr(DInt(1), DInt(2)))
    val b = DObj("x" -> DInt(9), "o" -> DObj("q" -> DInt(9), "r" -> DInt(3)), "arr" -> DArr(DInt(7)))
    val m = Paths.merge(a, b)
    assert(m === DObj(
      "x" -> DInt(9),
      "o" -> DObj("p" -> DInt(1), "q" -> DInt(9), "r" -> DInt(3)),
      "arr" -> DArr(DInt(7), DInt(2)),
    ))
  }

  test("truthiness") {
    assert(!DNull.truthy && !DBool(false).truthy && !DInt(0).truthy && !DStr("").truthy && !DDbl(0.0).truthy)
    assert(DInt(1).truthy && DStr("x").truthy && DObj.empty.truthy && DArr().truthy)
  }

  test("JSON round-trip") {
    val doc = DObj(
      "s" -> DStr("he said \"hi\"\nline2"),
      "i" -> DInt(42),
      "d" -> DDbl(3.5),
      "b" -> DBool(true),
      "n" -> DNull,
      "arr" -> DArr(DInt(1), DStr("two"), DObj("k" -> DInt(3))),
      "nested" -> DObj("a" -> DObj("b" -> DInt(1))),
    )
    assert(Json.parse(Json.render(doc)) === doc)
  }

  test("JSON parse basics") {
    assert(Json.parse("""{"k": 87}""") === DObj("k" -> DInt(87)))
    assert(Json.parse("""[1, 2.5, "x", null, true]""") ===
      DArr(DInt(1), DDbl(2.5), DStr("x"), DNull, DBool(true)))
    assert(Json.parse("""{}""") === DObj.empty)
    assert(Json.parse("""{"a":{"b":[{"c":1}]}}""") ===
      DObj("a" -> DObj("b" -> DArr(DObj("c" -> DInt(1))))))
  }
}
