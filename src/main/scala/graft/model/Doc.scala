package graft.model

import scala.collection.mutable

/** Dynamic-document value model.
  *
  * The reference engine flows schemaless BSON/JSON documents
  * (`[key: string]: any`, reference src/types.ts:3-11) through its
  * operators and manipulates them with lodash dotted-path functions
  * (`_.get/_.set/_.has/_.unset/_.merge`, reference
  * src/processor.ts:61,72-73,96-102). This ADT is the engine-side
  * equivalent: an immutable, insertion-ordered JSON tree used (a) by the
  * pure transform/compaction core and (b) inside typed Spark operators,
  * where dynamic docs ride in DataFrames as JSON-string columns and are
  * parsed at the `flatMapGroups` boundary.
  *
  * Equality is structural; `DObj` preserves key insertion order (like JS
  * objects) so goldens ported from the reference compare deterministically.
  */
sealed trait DVal {
  /** JS truthiness — the reference tests `$unset` values for truthiness
    * (`_.get(unset, key)` used as a boolean, reference src/processor.ts:97). */
  def truthy: Boolean = this match {
    case DNull        => false
    case DBool(b)     => b
    case DInt(i)      => i != 0L
    case DDbl(d)      => d != 0.0 && !d.isNaN
    case DStr(s)      => s.nonEmpty
    case _            => true
  }
  def render: String = Json.render(this)
}

final case class DObj(fields: Vector[(String, DVal)]) extends DVal {
  def get(k: String): Option[DVal] = fields.collectFirst { case (`k`, v) => v }
  def contains(k: String): Boolean = fields.exists(_._1 == k)
  def keys: Vector[String] = fields.map(_._1)
  def isEmpty: Boolean = fields.isEmpty
  def size: Int = fields.length
  /** Replace in place if the key exists (keeping its position), else append —
    * mirrors JS object assignment order semantics. */
  def updated(k: String, v: DVal): DObj =
    if (contains(k)) DObj(fields.map { case (key, old) => if (key == k) (key, v) else (key, old) })
    else DObj(fields :+ (k -> v))
  def removed(k: String): DObj = DObj(fields.filterNot(_._1 == k))
  def ++(other: DObj): DObj = other.fields.foldLeft(this) { case (acc, (k, v)) => acc.updated(k, v) }
}
object DObj {
  val empty: DObj = DObj(Vector.empty)
  def apply(kvs: (String, DVal)*): DObj = DObj(kvs.toVector)
}

final case class DArr(items: Vector[DVal]) extends DVal
object DArr { def apply(vs: DVal*): DArr = DArr(vs.toVector) }

final case class DStr(s: String) extends DVal
final case class DInt(i: Long) extends DVal
final case class DDbl(d: Double) extends DVal
final case class DBool(b: Boolean) extends DVal
case object DNull extends DVal

/** lodash-compatible dotted-path operations.
  *
  * Semantics pinned by the reference's goldens
  * (reference test/processor.test.ts:104-120,132-184): lodash `castPath`
  * treats a path string containing `.` as a *direct key* when the root
  * object literally has that key (e.g. `{"field0.field1": 0}` updated via
  * path `"field0.field1"` writes the literal key, not a nested one);
  * otherwise it splits on `.` and traverses.
  */
object Paths {
  private def castPath(root: DVal, path: String): Vector[String] =
    if (!path.contains('.')) Vector(path)
    else root match {
      case o: DObj if o.contains(path) => Vector(path)
      case _                           => path.split('.').toVector
    }

  private def step(v: DVal, seg: String): Option[DVal] = v match {
    case o: DObj => o.get(seg)
    case DArr(items) =>
      seg.toIntOption.filter(i => i >= 0 && i < items.length).map(items)
    case _ => None
  }

  def get(doc: DVal, path: String): Option[DVal] = {
    val segs = castPath(doc, path)
    segs.foldLeft(Option(doc)) { (cur, seg) => cur.flatMap(step(_, seg)) }
  }

  def has(doc: DVal, path: String): Boolean = get(doc, path).isDefined

  /** `_.set` — creates intermediate objects; replaces non-container
    * intermediates with fresh objects (lodash behavior). */
  def set(doc: DObj, path: String, value: DVal): DObj = {
    def go(cur: DVal, segs: Vector[String]): DVal = segs match {
      case seg +: rest =>
        val obj = cur match {
          case o: DObj => o
          case a: DArr =>
            seg.toIntOption match {
              case Some(i) if i >= 0 =>
                val padded = a.items.padTo(i + 1, DNull)
                return DArr(padded.updated(i, go(padded(i), rest)))
              case _ => DObj.empty
            }
          case _ => DObj.empty
        }
        obj.updated(seg, go(obj.get(seg).getOrElse(DNull), rest))
      case _ => value // empty path: replace
    }
    go(doc, castPath(doc, path)).asInstanceOf[DObj]
  }

  /** `_.unset` — removes the leaf key if the full path resolves. */
  def unset(doc: DObj, path: String): DObj = {
    def go(cur: DVal, segs: Vector[String]): DVal = segs match {
      case Vector(last) =>
        cur match {
          case o: DObj       => o.removed(last)
          case DArr(items)   =>
            last.toIntOption.filter(i => i >= 0 && i < items.length)
              .map(i => DArr(items.updated(i, DNull))).getOrElse(cur)
          case other => other
        }
      case seg +: rest =>
        cur match {
          case o: DObj if o.contains(seg) => o.updated(seg, go(o.get(seg).get, rest))
          case a: DArr =>
            seg.toIntOption.filter(i => i >= 0 && i < a.items.length)
              .map(i => DArr(a.items.updated(i, go(a.items(i), rest)))).getOrElse(cur)
          case other => other
        }
      case _ => cur // empty path: nothing to remove
    }
    if (!has(doc, path)) doc else go(doc, castPath(doc, path)).asInstanceOf[DObj]
  }

  /** `_.merge(a, b)` — deep recursive merge, later keys win for scalars,
    * objects merge recursively, arrays merge index-wise (lodash treats
    * arrays like objects). Pinned by the u+u compaction golden
    * (reference src/processor.ts:275, test/processor.test.ts:186-247). */
  def merge(a: DVal, b: DVal): DVal = (a, b) match {
    case (ao: DObj, bo: DObj) =>
      bo.fields.foldLeft(ao) { case (acc, (k, bv)) =>
        acc.get(k) match {
          case Some(av) => acc.updated(k, merge(av, bv))
          case None     => acc.updated(k, bv)
        }
      }
    case (DArr(ai), DArr(bi)) =>
      val merged = ai.zipAll(bi, DNull, DNull).zipWithIndex.map { case ((av, bv), i) =>
        if (i < bi.length && i < ai.length) merge(av, bv)
        else if (i < bi.length) bv
        else av
      }
      DArr(merged)
    case (_, bv) => bv
  }
}

/** Minimal deterministic JSON codec (no external deps; used at the
  * DataFrame JSON-string <-> DVal boundary). */
object Json {
  def render(v: DVal): String = {
    val sb = new StringBuilder
    def esc(s: String): Unit = {
      sb.append('"')
      // fast path: bulk-append when nothing needs escaping (the common
      // case for document keys and most values — this codec sits on the
      // per-event hot path of the CDC batch apply)
      var i = 0
      var plainFrom = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '"' || c == '\\' || c < ' ') {
          if (plainFrom < i) sb.append(s.substring(plainFrom, i))
          c match {
            case '"'  => sb.append("\\\"")
            case '\\' => sb.append("\\\\")
            case '\n' => sb.append("\\n")
            case '\r' => sb.append("\\r")
            case '\t' => sb.append("\\t")
            case _    => sb.append(f"\\u${c.toInt}%04x")
          }
          plainFrom = i + 1
        }
        i += 1
      }
      if (plainFrom < s.length) sb.append(s.substring(plainFrom))
      sb.append('"')
    }
    def go(v: DVal): Unit = v match {
      case DNull    => sb.append("null")
      case DBool(b) => sb.append(b)
      case DInt(i)  => sb.append(i)
      case DDbl(d)  =>
        if (d.isNaN || d.isInfinite) sb.append("null")
        else if (d == Math.floor(d) && Math.abs(d) < 1e15) { sb.append(d.toLong); sb.append(".0") }
        else sb.append(d)
      case DStr(s)  => esc(s)
      case DArr(items) =>
        sb.append('[')
        var first = true
        items.foreach { it => if (!first) sb.append(','); first = false; go(it) }
        sb.append(']')
      case DObj(fields) =>
        sb.append('{')
        var first = true
        fields.foreach { case (k, fv) => if (!first) sb.append(','); first = false; esc(k); sb.append(':'); go(fv) }
        sb.append('}')
    }
    go(v)
    sb.toString
  }

  def parse(s: String): DVal = {
    var i = 0
    def err(msg: String) = throw new IllegalArgumentException(s"JSON parse error at $i: $msg in: ${s.take(200)}")
    def ws(): Unit = while (i < s.length && (s(i) == ' ' || s(i) == '\n' || s(i) == '\t' || s(i) == '\r')) i += 1
    def expect(c: Char): Unit = { if (i >= s.length || s(i) != c) err(s"expected '$c'"); i += 1 }
    def parseStr(): String = {
      expect('"')
      // fast path: no escapes -> direct substring, no builder (hot path:
      // every document field of every event goes through here)
      val start = i
      while (i < s.length && s(i) != '"' && s(i) != '\\') i += 1
      if (i < s.length && s(i) == '"') {
        val r = s.substring(start, i)
        i += 1
        return r
      }
      val sb = new StringBuilder(s.substring(start, i))
      while (i < s.length && s(i) != '"') {
        if (s(i) == '\\') {
          i += 1
          s(i) match {
            case '"'  => sb.append('"')
            case '\\' => sb.append('\\')
            case '/'  => sb.append('/')
            case 'b'  => sb.append('\b')
            case 'f'  => sb.append('\f')
            case 'n'  => sb.append('\n')
            case 'r'  => sb.append('\r')
            case 't'  => sb.append('\t')
            case 'u'  =>
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar); i += 4
            case c => err(s"bad escape \\$c")
          }
          i += 1
        } else { sb.append(s(i)); i += 1 }
      }
      expect('"')
      sb.toString
    }
    def parseVal(): DVal = {
      ws()
      if (i >= s.length) err("eof")
      s(i) match {
        case '{' =>
          i += 1; ws()
          val buf = mutable.ArrayBuffer.empty[(String, DVal)]
          if (i < s.length && s(i) == '}') { i += 1; return DObj(buf.toVector) }
          while (true) {
            ws()
            val k = parseStr(); ws(); expect(':')
            buf += (k -> parseVal())
            ws()
            if (i < s.length && s(i) == ',') i += 1
            else { expect('}'); return DObj(buf.toVector) }
          }
          DObj(buf.toVector)
        case '[' =>
          i += 1; ws()
          val buf = mutable.ArrayBuffer.empty[DVal]
          if (i < s.length && s(i) == ']') { i += 1; return DArr(buf.toVector) }
          while (true) {
            buf += parseVal()
            ws()
            if (i < s.length && s(i) == ',') i += 1
            else { expect(']'); return DArr(buf.toVector) }
          }
          DArr(buf.toVector)
        case '"' => DStr(parseStr())
        case 't' =>
          if (!s.startsWith("true", i)) err("bad literal"); i += 4; DBool(true)
        case 'f' =>
          if (!s.startsWith("false", i)) err("bad literal"); i += 5; DBool(false)
        case 'n' =>
          if (!s.startsWith("null", i)) err("bad literal"); i += 4; DNull
        case _ =>
          val start = i
          while (i < s.length && ("+-0123456789.eE".indexOf(s(i)) >= 0)) i += 1
          val lit = s.substring(start, i)
          if (lit.isEmpty) err(s"unexpected character '${s(start)}'")
          if (lit.exists(c => c == '.' || c == 'e' || c == 'E')) DDbl(lit.toDouble)
          else lit.toLongOption.map(DInt.apply).getOrElse(DDbl(lit.toDouble))
      }
    }
    val v = parseVal()
    ws()
    // corrupt docs must fail (and be dropped by the Try-based per-event
    // error contract), not silently parse a prefix
    if (i < s.length) err("trailing characters after top-level value")
    v
  }

  def parseObj(s: String): DObj = parse(s) match {
    case o: DObj => o
    case other   => throw new IllegalArgumentException(s"expected JSON object, got $other")
  }
}
