package graft.sink

import java.net.{InetSocketAddress, URI}
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import graft.model.EngineConfig

/** The live index-DDL leg against a stub ES: exists→create→putMapping
  * request shapes and ordering (reference src/indices.ts:19-57), the
  * blue/green suffix, retry of 503s, the create-race tolerance, and
  * fail-fast on rejected DDL.
  */
class DdlHttpSpec extends AnyFunSuite {

  private val fast = DdlHttp.Policy(maxRetries = 3, backoffMs = 1)

  private final case class Req(method: String, path: String, body: String)

  /** Stub ES: `existing` controls HEAD answers; `script` may override
    * any (method, path, requestIndex) with a status. Records requests. */
  private def withStub(existing: Set[String],
      script: (Req, Int) => Option[(Int, String)] = (_, _) => None)(
      run: URI => Unit): Vector[Req] = {
    val seen = scala.collection.mutable.ArrayBuffer[Req]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val req = Req(ex.getRequestMethod,
        ex.getRequestURI.getPath.stripPrefix("/"),
        new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
      val n = seen.synchronized { seen += req; seen.size - 1 }
      val (status, body) = script(req, n).getOrElse {
        req.method match {
          case "HEAD" => (if (existing(req.path)) 200 else 404, "")
          case "PUT"  => (200, """{"acknowledged":true}""")
          case _      => (405, "")
        }
      }
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      // HEAD must not carry a body
      if (req.method == "HEAD" || bytes.isEmpty) ex.sendResponseHeaders(status, -1)
      else {
        ex.sendResponseHeaders(status, bytes.length)
        ex.getResponseBody.write(bytes)
      }
      ex.close()
    })
    server.start()
    try run(new URI(s"http://127.0.0.1:${server.getAddress.getPort}"))
    finally server.stop(0)
    seen.toVector
  }

  private val configJson =
    """{
      |  "mongodb": {"url": "mongodb://localhost:27017"},
      |  "elasticsearch": {
      |    "options": {"host": "http://localhost:9200"},
      |    "indices": [
      |      {"index": "banner", "body": {"settings": {"index": {"number_of_shards": 3}}}},
      |      {"index": "user",   "body": {"settings": {"index": {"number_of_shards": 1}}}}
      |    ]
      |  },
      |  "controls": {"indexNameSuffix": "_v2"},
      |  "tasks": [{
      |    "from": {"phase": "scan"},
      |    "extract": {"db": "db", "collection": "banners"},
      |    "transform": {"mapping": {"name": "name"}},
      |    "load": {
      |      "index": "banner", "type": "banner",
      |      "body": {"banner": {"properties": {"name": {"type": "keyword"}}}}
      |    }
      |  }]
      |}""".stripMargin

  test("fresh cluster: exists→create per declared index, then put every task mapping, in order") {
    val cfg = EngineConfig.fromJson(configJson)
    var report: DdlHttp.DdlReport = null
    val reqs = withStub(Set.empty) { base =>
      report = DdlHttp.initFromConfig(cfg, base, policy = fast)
    }
    assert(report.created === Vector("banner_v2", "user_v2"))
    assert(report.mappedIndices === Vector("banner_v2"))
    assert(reqs.map(r => (r.method, r.path)) === Vector(
      ("HEAD", "banner_v2"), ("PUT", "banner_v2"),
      ("HEAD", "user_v2"), ("PUT", "user_v2"),
      ("PUT", "banner_v2/_mapping/banner")))
    // create body is the config's IndicesCreateParams.body, verbatim JSON
    assert(reqs(1).body.contains(""""number_of_shards":3"""))
    // mapping body is the task's load.body (pre-7 typed nesting intact)
    assert(reqs(4).body.contains(""""name":{"type":"keyword"}"""))
  }

  test("existing index: no create, mapping still put (reference exists-check)") {
    val cfg = EngineConfig.fromJson(configJson)
    var report: DdlHttp.DdlReport = null
    val reqs = withStub(Set("banner_v2", "user_v2")) { base =>
      report = DdlHttp.initFromConfig(cfg, base, policy = fast)
    }
    assert(report.created.isEmpty)
    assert(reqs.map(r => (r.method, r.path)) === Vector(
      ("HEAD", "banner_v2"), ("HEAD", "user_v2"),
      ("PUT", "banner_v2/_mapping/banner")))
  }

  test("503s retry with backoff until success") {
    val cfg = EngineConfig.fromJson(configJson)
    val reqs = withStub(Set("user_v2"), {
      // first create attempt for banner_v2 and first mapping attempt 503
      case (Req("PUT", "banner_v2", _), n) if n == 1 => Some((503, ""))
      case _ => None
    }) { base =>
      val r = DdlHttp.initFromConfig(cfg, base, policy = fast)
      assert(r.created === Vector("banner_v2"))
    }
    assert(reqs.count(r => r.method == "PUT" && r.path == "banner_v2") === 2)
  }

  test("lost create race (400 resource_already_exists) counts as exists, not failure") {
    val cfg = EngineConfig.fromJson(configJson)
    withStub(Set("user_v2"), {
      case (Req("PUT", "banner_v2", _), _) =>
        Some((400, """{"error":{"type":"resource_already_exists_exception"}}"""))
      case _ => None
    }) { base =>
      val r = DdlHttp.initFromConfig(cfg, base, policy = fast)
      assert(r.created.isEmpty, "racing create must not report as created")
      assert(r.mappedIndices === Vector("banner_v2"))
    }
  }

  test("any other 4xx fails fast — the pipeline must not start on rejected DDL") {
    val cfg = EngineConfig.fromJson(configJson)
    withStub(Set.empty, {
      case (Req("PUT", "banner_v2", _), _) =>
        Some((400, """{"error":{"type":"mapper_parsing_exception"}}"""))
      case _ => None
    }) { base =>
      val e = intercept[DdlHttp.DdlFailedException] {
        DdlHttp.initFromConfig(cfg, base, policy = fast)
      }
      assert(e.getMessage.contains("create banner_v2"))
    }
  }

  test("exhausted transport/5xx retries throw with the attempt count") {
    val cfg = EngineConfig.fromJson(configJson)
    withStub(Set.empty, { case (_, _) => Some((503, "")) }) { base =>
      val e = intercept[DdlHttp.DdlFailedException] {
        DdlHttp.initFromConfig(cfg, base, policy = fast)
      }
      assert(e.getMessage.contains("after 4 attempts"))
    }
  }

  test("untyped (_doc / empty type) mapping PUTs to /<index>/_mapping") {
    val cfg0 = EngineConfig.fromJson(configJson)
    val td = cfg0.tasks.head
    val cfg = cfg0.copy(tasks = Vector(
      td.copy(load = td.load.copy(esType = "_doc"))))
    val reqs = withStub(Set("banner_v2", "user_v2")) { base =>
      DdlHttp.initFromConfig(cfg, base, policy = fast)
    }
    assert(reqs.last.path === "banner_v2/_mapping")
  }
}
