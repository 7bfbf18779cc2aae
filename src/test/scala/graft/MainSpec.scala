package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.StateStore

/** The CLI wiring end-to-end: a reference-shaped config.json file +
  * file-backed sources drive DDL → scan backfill → streaming tail via
  * `graft.Main.run`, the same lifecycle `main(argv)` runs before its
  * terminal await. */
class MainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("config file to running tail: scan seeds state, stream applies on top, restart resumes") {
    val base = Files.createTempDirectory("main-e2e-base").toString
    val data = Files.createTempDirectory("main-e2e-data").toString
    val taskName = "app.users___users.user"
    // other suites may have registered an untyped `users` (CREATE TABLE
    // IF NOT EXISTS is the blue/green contract: an existing table wins)
    // — this test needs ITS config's typed schema
    spark.sql("DROP TABLE IF EXISTS users")

    // per-task source layout: parquet snapshot + JSON-lines oplog
    Files.createDirectories(java.nio.file.Paths.get(s"$data/$taskName/oplog"))
    spark.createDataFrame(Seq(
      ("a", """{"_id":"a","score":1.0}"""),
      ("b", """{"_id":"b","score":2.0}"""),
    )).toDF("id", "doc").write.parquet(s"$data/$taskName/snapshot")
    Files.write(java.nio.file.Paths.get(s"$data/$taskName/oplog/b1.jsonl"), Seq(
      """{"ts":100,"op":"u","ns":"app.users","id":"a","doc":{"$set":{"score":9.5}}}""",
      """{"ts":101,"op":"i","ns":"app.users","id":"c","doc":{"_id":"c","score":3.0}}""",
    ).mkString("\n").getBytes)

    val configPath = s"$data/config.json"
    Files.write(java.nio.file.Paths.get(configPath),
      """{
        |  "controls": {"elasticsearchBulkInterval": 100, "mongodbReadCapacity": 1000},
        |  "mongodb": {"url": "mongodb://h/app"},
        |  "tasks": [{
        |    "from": {"phase": "scan"},
        |    "extract": {"db": "app", "collection": "users"},
        |    "transform": {"mapping": {"score": "score"}},
        |    "load": {"index": "users", "type": "user",
        |      "body": {"properties": {"score": {"type": "double"}}}}
        |  }]
        |}""".stripMargin.getBytes)

    val queries = Main.run(spark, configPath, base, data)
    assert(queries.length === 1)
    queries.foreach { q => q.processAllAvailable(); q.stop() }

    val stateDir = s"$base/$taskName/state"
    def state() = StateStore.read(spark, stateDir).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[String]("doc")).toMap
    assert(state() === Map(
      "a" -> """{"_id":"a","score":9.5}""", // $set resolved against the backfilled doc
      "b" -> """{"_id":"b","score":2.0}""", // scan-only key
      "c" -> """{"_id":"c","score":3.0}""", // streamed insert
    ))
    // the DDL ran before data flowed (Indices.init equivalent): the
    // sink table is registered with its configured name
    assert(spark.catalog.tableExists("users"))

    // restart with the same dirs: a new oplog batch applies, the scan
    // does NOT re-run (state dir is the phase checkpoint), committed
    // batches are not reprocessed
    Files.write(java.nio.file.Paths.get(s"$data/$taskName/oplog/b2.jsonl"),
      """{"ts":102,"op":"d","ns":"app.users","id":"b","doc":{"_id":"b"}}""".getBytes)
    val queries2 = Main.run(spark, configPath, base, data)
    queries2.foreach { q => q.processAllAvailable(); q.stop() }
    assert(state() === Map(
      "a" -> """{"_id":"a","score":9.5}""",
      "c" -> """{"_id":"c","score":3.0}""",
    ))

    // publish: the typed sink table now answers the queries a mongo-es
    // user would ask ES (score is a real double via from_json)
    val config = graft.model.EngineConfig.fromJson(
      new String(Files.readAllBytes(java.nio.file.Paths.get(configPath))))
    val published = graft.sink.Ddl.publishFromConfig(spark, config, base)
    assert(published === Map("users" -> 2L))
    val rows = spark.sql("SELECT _id, score FROM users ORDER BY _id")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows === Map("a" -> 9.5, "c" -> 3.0))
  }

  test("a 2-task config runs CONCURRENT tails with isolated state/checkpoints per task") {
    val base = Files.createTempDirectory("main-2task-base").toString
    val data = Files.createTempDirectory("main-2task-data").toString
    val tasks = Seq(
      ("app.users2___users2.user", "app.users2", "users2"),
      ("app.orders2___orders2.order", "app.orders2", "orders2"))
    spark.sql("DROP TABLE IF EXISTS users2")
    spark.sql("DROP TABLE IF EXISTS orders2")
    tasks.foreach { case (taskName, ns, _) =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$data/$taskName/oplog"))
      spark.createDataFrame(Seq((s"$ns-a", s"""{"_id":"$ns-a","v":1.0}""")))
        .toDF("id", "doc").write.parquet(s"$data/$taskName/snapshot")
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$data/$taskName/oplog/b1.jsonl"),
        s"""{"ts":100,"op":"i","ns":"$ns","id":"$ns-b","doc":{"_id":"$ns-b","v":2.0}}""".getBytes)
    }
    val configPath = s"$data/config.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(configPath),
      """{
        |  "controls": {"elasticsearchBulkInterval": 100},
        |  "mongodb": {"url": "mongodb://h/app"},
        |  "tasks": [
        |    {"from": {"phase": "scan"},
        |     "extract": {"db": "app", "collection": "users2"},
        |     "transform": {"mapping": {"v": "v"}},
        |     "load": {"index": "users2", "type": "user",
        |       "body": {"properties": {"v": {"type": "double"}}}}},
        |    {"from": {"phase": "scan"},
        |     "extract": {"db": "app", "collection": "orders2"},
        |     "transform": {"mapping": {"v": "v"}},
        |     "load": {"index": "orders2", "type": "order",
        |       "body": {"properties": {"v": {"type": "double"}}}}}
        |  ]
        |}""".stripMargin.getBytes)

    val queries = Main.run(spark, configPath, base, data)
    assert(queries.length === 2, "one concurrent tail per task")
    // both run at once (the reference's concurrent-tails contract):
    // drain both before stopping either
    queries.foreach(_.processAllAvailable())
    queries.foreach(_.stop())

    tasks.foreach { case (taskName, ns, table) =>
      val st = StateStore.read(spark, s"$base/$taskName/state").collect()
        .map(_.getAs[String]("id")).toSet
      assert(st === Set(s"$ns-a", s"$ns-b"), s"task $taskName state")
      assert(spark.catalog.tableExists(table))
    }
    // no cross-task bleed: each state dir holds only its own namespace
    val usersState = StateStore.read(spark, s"$base/${tasks.head._1}/state")
      .collect().map(_.getAs[String]("id"))
    assert(usersState.forall(_.startsWith("app.users2")))
  }

  test("a mongodb:// url with options.sidecarUrl selects the live wire adapters against the sidecar") {
    import java.net.InetSocketAddress
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val requests = scala.collection.mutable.ArrayBuffer[String]()
    val sidecar = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    sidecar.createContext("/", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      requests.synchronized { requests += path }
      val body =
        if (path == "/oplog/latest") """{"seq":1}"""
        else if (path == "/oplog")
          """{"seq":1,"ts":100,"op":"i","ns":"app.wired","id":"w2","doc":{"_id":"w2","v":2.0}}"""
        else if (path.startsWith("/snapshot/")) """{"id":"w1","doc":{"_id":"w1","v":1.0}}"""
        else ""
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length); ex.getResponseBody.write(bytes); ex.close()
    })
    sidecar.start()
    try {
      val base = Files.createTempDirectory("main-sidecar-base").toString
      val data = Files.createTempDirectory("main-sidecar-data").toString // intentionally EMPTY
      spark.sql("DROP TABLE IF EXISTS wired")
      val configPath = s"$data/config.json"
      Files.write(java.nio.file.Paths.get(configPath),
        s"""{
           |  "controls": {"elasticsearchBulkInterval": 100},
           |  "mongodb": {
           |    "url": "mongodb://rs0.example:27017/?replicaSet=rs0",
           |    "options": {"sidecarUrl": "http://127.0.0.1:${sidecar.getAddress.getPort}"}
           |  },
           |  "tasks": [{
           |    "from": {"phase": "scan"},
           |    "extract": {"db": "app", "collection": "wired"},
           |    "transform": {"mapping": {"v": "v"}},
           |    "load": {"index": "wired", "type": "w",
           |      "body": {"properties": {"v": {"type": "double"}}}}
           |  }]
           |}""".stripMargin.getBytes)
      val queries = Main.run(spark, configPath, base, data)
      queries.foreach { q => q.processAllAvailable(); q.stop() }
      // data flowed from the SIDECAR (dataDir is empty): scan + tail
      val st = StateStore.read(spark, s"$base/app.wired___wired.w/state").collect()
        .map(_.getAs[String]("id")).toSet
      assert(st === Set("w1", "w2"))
      assert(requests.exists(_.startsWith("/snapshot/app.wired")), requests.mkString("\n"))
      assert(requests.contains("/oplog/latest"), requests.mkString("\n"))
    } finally sidecar.stop(0)
  }

  test("a non-http sidecarUrl fails fast at config time") {
    val base = Files.createTempDirectory("main-badsidecar-base").toString
    val data = Files.createTempDirectory("main-badsidecar-data").toString
    val configPath = s"$data/config.json"
    Files.write(java.nio.file.Paths.get(configPath),
      """{
        |  "controls": {},
        |  "mongodb": {"url": "mongodb://h/app", "options": {"sidecarUrl": "ftp://nope"}},
        |  "tasks": []
        |}""".stripMargin.getBytes)
    val e = intercept[IllegalArgumentException](Main.run(spark, configPath, base, data))
    assert(e.getMessage.contains("sidecarUrl"))
  }
}
