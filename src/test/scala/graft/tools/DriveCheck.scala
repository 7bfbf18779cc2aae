package graft.tools
import graft.model._
import graft.core._
object DriveCheck {
  def main(args: Array[String]): Unit = {
    val task = TaskSpec(Vector("field0.field1" -> "field1", "field0.field2" -> "field2"))
    val doc = Json.parseObj("""{"_id":"aaaaaaaaaaaaaaaaaaaaaaaa","field0":{"field1":1,"field2":2}}""")
    println("IR upsert = " + Transformer.transformer(task, "upsert", doc))
    val batch = Seq(
      Oplog(BsonTs(0,0), "i", "db.c", Json.parseObj("""{"_id":"k1","field0":{"field1":10}}""")),
      Oplog(BsonTs(1,0), "u", "db.c", Json.parseObj("""{"$set":{"field0.field1":11}}"""), Some(Json.parseObj("""{"_id":"k1"}"""))),
      Oplog(BsonTs(0,5), "i", "db.c", Json.parseObj("""{"_id":"k2","field0":{"field1":20}}""")),
      Oplog(BsonTs(2,0), "d", "db.c", Json.parseObj("""{"_id":"k2"}""")))
    val compacted = Transformer.mergeOplogs(task, batch)
    println("compacted = " + compacted.map(o => (o.op, o.docId, o.o.render)))
    println("IRs = " + compacted.flatMap(o => Transformer.dispatch(task, o)))
    val bad = batch :+ Oplog(BsonTs(9,0), "u", "db.c", Json.parseObj("""{"$set":{"field0.field1":1}}"""), None)
    println("probe missing o2 -> " + Transformer.mergeOplogs(task, bad).length + " events, no crash")
    println("probe invalid delete -> " + Transformer.dispatch(task, Oplog(BsonTs(3,0), "d", "db.c", Json.parseObj("""{"_id":"k1","x":1}"""))))
    try { Json.parse("""{"a": }"""); println("probe malformed JSON -> NO ERROR (bad)") }
    catch { case e: IllegalArgumentException => println("probe malformed JSON -> " + e.getMessage.take(60)) }
    val u = Json.parse("""{"s":"é\t\"quoted\"","emoji":"😀"}""")
    println("probe unicode round-trip = " + (Json.parse(u.render) == u) + " " + u.render)
    val ooo = Seq(
      Oplog(BsonTs(5,0), "u", "db.c", Json.parseObj("""{"$set":{"field0.field1":99}}"""), Some(Json.parseObj("""{"_id":"k3"}"""))),
      Oplog(BsonTs(1,0), "i", "db.c", Json.parseObj("""{"_id":"k3","field0":{"field1":1}}""")))
    println("probe u-before-i = " + Transformer.mergeOplogs(task, ooo).map(o => (o.op, o.o.render)))
    // probe: empty batch, single delete with no prior state
    println("probe empty batch = " + Transformer.mergeOplogs(task, Nil))
    println("probe lone delete IR = " + Transformer.dispatch(task, Oplog(BsonTs(1,0), "d", "ns", Json.parseObj("""{"_id":"ghost"}"""))))
  }
}
