package graft.model

/** BSON Timestamp: 32-bit unix seconds (high) + 32-bit ordinal (low).
  * The reference extracts the seconds part via `getHighBits()`
  * (reference src/processor.ts:62,87) and orders oplog events by the
  * full 64-bit value (reference src/processor.ts:262). Packing both
  * halves into one Long keeps `orderBy(ts)` equal to oplog total order
  * (SURVEY.md §1.2, §7.4).
  */
final case class BsonTs(seconds: Int, ord: Int) {
  def toLong: Long = (seconds.toLong << 32) | (ord.toLong & 0xffffffffL)
}
object BsonTs {
  def fromLong(l: Long): BsonTs = BsonTs((l >>> 32).toInt, (l & 0xffffffffL).toInt)
  implicit val ordering: Ordering[BsonTs] = Ordering.by(_.toLong)
}

/** One oplog change event — the i/u/d discriminated union
  * (reference src/types.ts:13-44) as a single case class:
  *   - op == "i": `o` = full new document (includes `_id`)
  *   - op == "u": `o` = replacement fields and/or `$set`/`$unset`
  *     sub-objects; `o2` = `{_id}` of the target document
  *   - op == "d": `o` = `{_id}` only
  */
final case class Oplog(
    ts: BsonTs,
    op: String,
    ns: String,
    o: DObj,
    o2: Option[DObj] = None,
    fromMigrate: Boolean = false,
) {
  /** Key-extraction helper: `o._id` for i/d, `o2._id` for u. */
  def docId: Option[String] = {
    val src = if (op == "u") o2 else Some(o)
    src.flatMap(_.get("_id")).collect {
      case DStr(s) => s
      case DInt(i) => i.toString
    }
  }
}

/** Intermediate representation emitted by the transform stage
  * (reference src/types.ts:46-63): either an upsert carrying the mapped
  * output document, or a delete. `parent` is the extracted parent-routing
  * value (reference src/processor.ts:61,86), `timestamp` the oplog
  * seconds (`ts.getHighBits()`).
  */
final case class IR(
    action: String, // "upsert" | "delete"
    id: String,
    data: Option[DObj],
    parent: Option[DVal],
    timestamp: Long,
)

/** The transform section of an ETL task (reference src/config.ts:44-56):
  * `mapping` is an ordered src-path -> dst-path projection, `static`
  * seeds every output doc with constants, `parent` names the doc path
  * whose value becomes the parent-routing key.
  */
final case class TaskSpec(
    mapping: Vector[(String, String)],
    static: DObj = DObj.empty,
    parent: Option[String] = None,
)
