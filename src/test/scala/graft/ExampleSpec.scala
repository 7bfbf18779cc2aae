package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.StateStore
import graft.model.{CheckpointSpec, FileCheckpointHooks}

/** The shipped `examples/` deployment must actually run: this drives
  * examples/config.json end-to-end through the same `Main.run` path
  * `spark-submit --class graft.Main … examples/config.json` takes,
  * with the file-backed checkpoint hooks from the walkthrough
  * (examples/README.md §4) standing in for the reference example's
  * Redis callbacks. */
class ExampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("the shipped examples/config.json runs end to end with file-backed hooks") {
    val base = Files.createTempDirectory("example-base").toString
    val data = Files.createTempDirectory("example-data").toString
    val hooksDir = Files.createTempDirectory("example-hooks").toString
    val taskName = "app.banners___banner.banner"
    spark.sql("DROP TABLE IF EXISTS banner_v1")

    // source layout from examples/README.md §2 (campaign = the config's
    // parent-routing field, T7)
    Files.createDirectories(Paths.get(s"$data/$taskName/oplog"))
    spark.createDataFrame(Seq(
      ("a", """{"_id":"a","name":"spring sale","weight":1.0,"deleted":false,"campaign":"cmp1"}"""),
      ("b", """{"_id":"b","name":"old promo","weight":2.0,"deleted":true,"campaign":"cmp2"}"""),
    )).toDF("id", "doc").write.parquet(s"$data/$taskName/snapshot")
    Files.write(Paths.get(s"$data/$taskName/oplog/b1.jsonl"), Seq(
      """{"ts":100,"op":"u","ns":"app.banners","id":"a","doc":{"$set":{"weight":2.5}}}""",
      """{"ts":101,"op":"i","ns":"app.banners","id":"c","doc":{"_id":"c","name":"new","weight":3.0,"deleted":false,"campaign":"cmp1"}}""",
      """{"ts":102,"op":"d","ns":"app.banners","id":"b","doc":{"_id":"b"}}""",
    ).mkString("\n").getBytes)

    // the exact shipped config, not a copy
    val hooks = new FileCheckpointHooks(hooksDir)
    val config = graft.model.EngineConfig.fromJson(
      new String(Files.readAllBytes(Paths.get("examples/config.json"))))
    val queries = graft.pipeline.Runner.fromConfig(
      spark, config, base, Main.fileAdapters(spark, data), Some(hooks))
    assert(queries.length === 1)
    queries.foreach { q => q.processAllAvailable(); q.stop() }

    // the blue/green suffix from the config's controls shapes the dirs
    val stateDir = s"$base/${taskName}_v1/state"
    val state = StateStore.read(spark, stateDir).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[String]("doc")).toMap
    assert(state.keySet === Set("a", "c"), "the oplog delete must erase b")
    assert(state("a").contains(""""weight":2.5"""), state("a"))

    // the load leg (reference src/processor.ts:225-258 +
    // src/elasticsearch.ts:22-28): the config's bulkDir received the
    // micro-batch's outcomes as _bulk bodies — index arms with their
    // source line and _parent routing, the delete arm routing-only
    import scala.jdk.CollectionConverters._
    val bulkTask = Paths.get(s"$base/bulk/${taskName}_v1")
    assert(Files.exists(bulkTask), "bulkDir from the shipped config must produce bulk output")
    def walk() = Files.walk(bulkTask).iterator().asScala.toVector
    def linesUnder(sub: String) = walk()
      .filter(p => p.toString.contains(s"/$sub/") && p.toString.endsWith(".bulk"))
      .flatMap(p => Files.readAllLines(p).asScala)
    // scan phase: the backfill bulk-indexes the snapshot (reference
    // src/index.ts:27-32) — two index arms, pre-oplog docs
    val scanLines = linesUnder("batch-scan")
    assert(scanLines.count(_.startsWith("""{"index":""")) === 2, scanLines)
    assert(scanLines.count(_.startsWith("""{"delete":""")) === 0, scanLines)
    assert(scanLines.exists(l => l.contains("\"_id\":\"b\"") && l.contains("\"_parent\":\"cmp2\"")),
      scanLines)
    // tail phase: the micro-batch's outcomes
    val bulkLines = linesUnder("batch-00000")
    assert(bulkLines.count(_.startsWith("""{"index":""")) === 2, bulkLines)
    assert(bulkLines.count(_.startsWith("""{"delete":""")) === 1, bulkLines)
    val aAction = bulkLines.find(l => l.startsWith("""{"index":""") && l.contains("\"_id\":\"a\"")).get
    assert(aAction.contains("\"_index\":\"banner_v1\"") && aAction.contains("\"_type\":\"banner\"")
      && aAction.contains("\"_parent\":\"cmp1\""), aAction)
    // the update's source line is the post-$set sink doc
    assert(bulkLines(bulkLines.indexOf(aAction) + 1).contains(""""weight":2.5"""))
    val dAction = bulkLines.find(_.startsWith("""{"delete":""")).get
    assert(dAction.contains("\"_id\":\"b\"") && dAction.contains("\"_parent\":\"cmp2\""), dAction)
    // each batch directory committed atomically (_SUCCESS after parts)
    assert(walk().exists(_.getFileName.toString == "_SUCCESS"))

    // DDL ran (Indices.init equivalent) with the blue/green suffix; the
    // mapping renamed deleted -> isDeleted and typed weight as double,
    // so after publish the README §5 query works against the live table
    assert(spark.catalog.tableExists("banner_v1"))
    val published = graft.sink.Ddl.publishFromConfig(spark, config, base)
    assert(published.nonEmpty)
    val top = spark.table("banner_v1")
      .filter(!org.apache.spark.sql.functions.col("isDeleted"))
      .orderBy(org.apache.spark.sql.functions.col("weight").desc)
      .select("name").collect().map(_.getString(0)).toSeq
    assert(top === Seq("new", "spring sale"))

    // the hooks mirrored progress: a tail checkpoint landed per task
    val saved = hooks.onLoad(taskName)
    assert(saved.exists(_.phase === "tail"), s"expected a tail checkpoint, got $saved")

    // and a stored checkpoint OVERRIDES the configured from on restart:
    // seed phase=tail so the scan is skipped entirely
    hooks.onSave(taskName, CheckpointSpec("tail", None, Some("1970-01-01T00:00:00Z")))
    val queries2 = graft.pipeline.Runner.fromConfig(
      spark, config, base, Main.fileAdapters(spark, data), Some(hooks))
    queries2.foreach { q => q.processAllAvailable(); q.stop() }
    val state2 = StateStore.read(spark, stateDir).collect()
      .map(r => r.getAs[String]("id")).toSet
    assert(state2 === Set("a", "c"), "restart with a tail checkpoint must not lose state")
  }

  test("ddlEndpoint drives the live exists→create→putMapping leg before the scan phase") {
    import java.net.InetSocketAddress
    import java.nio.charset.StandardCharsets
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val base = Files.createTempDirectory("example-ddl-base").toString
    val data = Files.createTempDirectory("example-ddl-data").toString
    val taskName = "app.banners___banner.banner"
    spark.sql("DROP TABLE IF EXISTS banner_v1")
    Files.createDirectories(Paths.get(s"$data/$taskName/oplog"))
    spark.createDataFrame(Seq(
      ("a", """{"_id":"a","name":"spring sale","weight":1.0,"deleted":false,"campaign":"cmp1"}"""),
    )).toDF("id", "doc").write.parquet(s"$data/$taskName/snapshot")

    val seen = scala.collection.mutable.ArrayBuffer[(String, String, String, Long)]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      seen.synchronized {
        seen += ((ex.getRequestMethod, ex.getRequestURI.getPath.stripPrefix("/"),
          body, System.nanoTime()))
      }
      ex.sendResponseHeaders(if (ex.getRequestMethod == "HEAD") 404 else 200, -1)
      ex.close()
    })
    server.start()
    try {
      val raw = new String(Files.readAllBytes(Paths.get("examples/config.json")))
      val config0 = graft.model.EngineConfig.fromJson(raw)
      val config = config0.copy(elasticsearchOptions = config0.elasticsearchOptions
        .updated("ddlEndpoint",
          graft.model.DStr(s"http://127.0.0.1:${server.getAddress.getPort}")))
      ExampleSpec.scanSeenNs.set(0L)
      val adapters = (td: graft.model.TaskDef, opts: Map[String, String]) => {
        val (snap, stream) = Main.fileAdapters(spark, data)(td, opts)
        // timestamp the first snapshot materialization to order it
        // against the DDL calls (static holder: local-mode closures are
        // serialized per task, but statics resolve in the shared JVM)
        (snap.mapPartitions { it =>
          ExampleSpec.scanSeenNs.compareAndSet(0L, System.nanoTime()); it
        }(org.apache.spark.sql.Encoders.row(snap.schema)), stream)
      }
      val scanSeen = ExampleSpec.scanSeenNs
      val queries = graft.pipeline.Runner.fromConfig(spark, config, base, adapters)
      queries.foreach { q => q.processAllAvailable(); q.stop() }
      val calls = seen.toVector
      // the shipped config declares one index (banner) + one task
      // mapping; suffix _v1 from controls
      assert(calls.map(c => (c._1, c._2)) === Vector(
        ("HEAD", "banner_v1"), ("PUT", "banner_v1"),
        ("PUT", "banner_v1/_mapping/banner")), calls.map(c => (c._1, c._2)))
      // index body straight from the example's IndicesCreateParams
      assert(calls(1)._3.contains(""""number_of_shards":3"""), calls(1)._3)
      // mapping body is the task's load.body
      assert(calls(2)._3.contains(""""isDeleted""""), calls(2)._3)
      // DDL strictly precedes the first scan read
      assert(scanSeen.get() > 0L, "scan must have run")
      assert(calls.map(_._4).max < scanSeen.get(),
        "every DDL call must land before the scan phase touches the source")
    } finally server.stop(0)
  }
}

object ExampleSpec {
  /** First-snapshot-read timestamp for the DDL-ordering test. */
  val scanSeenNs = new java.util.concurrent.atomic.AtomicLong(0L)
}
