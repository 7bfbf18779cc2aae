package graft.sink

import java.net.{InetSocketAddress, URI}
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** The live _bulk leg against a local stub endpoint: per-item retry of
  * retryable statuses, whole-request retry of transport/5xx failures,
  * the reference's batch-drop policy (exhausted failure throws so the
  * caller's checkpoint never advances — at-least-once by replay), and
  * the bounded-loss item-drop alternative.
  */
class BulkHttpSpec extends AnyFunSuite {

  private def body(ids: String*): IndexedSeq[String] =
    ids.toIndexedSeq.flatMap { id =>
      if (id.startsWith("del"))
        Seq(s"""{"delete":{"_index":"i","_type":"t","_id":"$id"}}""")
      else
        Seq(s"""{"index":{"_index":"i","_type":"t","_id":"$id"}}""", s"""{"f":"$id"}""")
    }

  private def itemsJson(statuses: Seq[(String, Int)]): String =
    statuses.map { case (id, st) =>
      s"""{"index":{"_index":"i","_id":"$id","status":$st}}"""
    }.mkString("""{"took":1,"errors":true,"items":[""", ",", "]}")

  /** Start a stub whose behavior per request is scripted: each handler
    * gets (requestIndex, parsed action ids) and returns either a
    * whole-request status or per-item statuses. */
  private def withStub(script: (Int, Vector[String]) => Either[Int, Vector[Int]])(
      run: URI => Unit): Vector[Vector[String]] = {
    val seen = scala.collection.mutable.ArrayBuffer[Vector[String]]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/_bulk", (ex: HttpExchange) => {
      val lines = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        .split("\n").toVector.filter(_.nonEmpty)
      val ids = BulkHttp.actionsOf(lines.toIndexedSeq).map(_.id)
      val n = seen.synchronized { seen += ids; seen.size - 1 }
      script(n, ids) match {
        case Left(status) =>
          ex.sendResponseHeaders(status, -1); ex.close()
        case Right(statuses) =>
          val resp = itemsJson(ids.zip(statuses)).getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, resp.length)
          ex.getResponseBody.write(resp); ex.close()
      }
    })
    server.start()
    try run(new URI(s"http://127.0.0.1:${server.getAddress.getPort}/_bulk"))
    finally server.stop(0)
    seen.toVector
  }

  private val fast = BulkHttp.Policy(maxRetries = 3, backoffMs = 1)

  test("clean batch acks everything in one request") {
    val reqs = withStub((_, ids) => Right(ids.map(_ => 200))) { uri =>
      val r = BulkHttp.bulk(body("a", "b", "del-c"), uri, fast)
      assert(r === BulkHttp.BulkReport(1, 3, Vector.empty))
    }
    assert(reqs === Vector(Vector("a", "b", "del-c")))
  }

  test("retryable item statuses re-send ONLY the failed items, then ack") {
    val reqs = withStub {
      case (0, ids) => Right(ids.map(id => if (id == "b") 429 else 200))
      case (_, ids) => Right(ids.map(_ => 201))
    } { uri =>
      val r = BulkHttp.bulk(body("a", "b", "c"), uri, fast)
      assert(r === BulkHttp.BulkReport(2, 3, Vector.empty))
    }
    assert(reqs === Vector(Vector("a", "b", "c"), Vector("b")),
      "second request must carry only the throttled item")
  }

  test("whole-request 503 retries with backoff, then succeeds") {
    val reqs = withStub {
      case (0, _)   => Left(503)
      case (_, ids) => Right(ids.map(_ => 200))
    } { uri =>
      val r = BulkHttp.bulk(body("a", "b"), uri, fast)
      assert(r === BulkHttp.BulkReport(2, 2, Vector.empty))
    }
    assert(reqs.size === 2)
  }

  test("batch-drop policy: exhausted retries throw, so the checkpoint never advances") {
    withStub((_, ids) => Right(ids.map(id => if (id == "b") 429 else 200))) { uri =>
      val e = intercept[BulkHttp.BulkFailedException] {
        BulkHttp.bulk(body("a", "b", "c"), uri, fast)
      }
      // the two clean items WERE acked before the policy fired — replay
      // is safe because loads are id-keyed upserts (idempotent)
      assert(e.report.acked === 2)
      assert(e.report.dropped.map(_.id) === Vector("b"))
      assert(e.report.requests === 4, "1 initial + maxRetries re-sends")
    }
  }

  test("item-drop policy: non-retryable 400 is recorded and delivery continues") {
    withStub((_, ids) => Right(ids.map {
      case "b" => 400
      case _   => 200
    })) { uri =>
      val r = BulkHttp.bulk(body("a", "b", "c"), uri,
        fast.copy(batchDropOnFailure = false))
      assert(r.acked === 2)
      assert(r.dropped === Vector(BulkHttp.ItemDrop("b", 400)))
      assert(r.requests === 1, "a 400 must NOT be retried")
    }
  }

  test("non-retryable whole-request status without an items body is a CLASSIFIED failure") {
    // a 400 error body has no 'items' array to partition on: the caller
    // must see BulkFailedException (its contract), not a raw parse or
    // require exception — and a 400 must not be retried
    val reqs = withStub((_, _) => Left(400)) { uri =>
      val e = intercept[BulkHttp.BulkFailedException] {
        BulkHttp.bulk(body("a", "b"), uri, fast)
      }
      assert(e.getMessage.contains("400"))
      assert(e.report.requests === 1, "a whole-request 400 must NOT be retried")
    }
    assert(reqs.size === 1)
  }

  test("malformed bulk body with dangling action metadata fails descriptively") {
    val e = intercept[IllegalArgumentException] {
      BulkHttp.actionsOf(IndexedSeq("""{"index":{"_index":"i","_type":"t","_id":"a"}}"""))
    }
    assert(e.getMessage.contains("dangling action metadata"))
  }

  test("transport failure (connection refused) exhausts retries and throws") {
    // a port nothing listens on
    val uri = new URI("http://127.0.0.1:1/_bulk")
    intercept[BulkHttp.BulkFailedException] {
      BulkHttp.bulk(body("a"), uri, fast)
    }
  }

  test("deliverFile posts a committed BulkJsonSink part file end-to-end (gzip)") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bulkhttp").toString
    Seq(("upsert", "1", """{"x":1}""", null: String, 1L),
        ("delete", "2", null: String, null: String, 2L))
      .toDF("action", "id", "data", "parent", "ts")
      .coalesce(1)
      .write.format("graft.source.v2.BulkJsonSink")
      .option("path", dir).option("index", "idx").option("type", "doc")
      .option("compress", "true")
      .mode("append").save()
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".bulk.gz")).head
    val reqs = withStub((_, ids) => Right(ids.map(_ => 200))) { uri =>
      val r = BulkHttp.deliverFile(part.getPath, uri, fast)
      assert(r === BulkHttp.BulkReport(1, 2, Vector.empty))
    }
    assert(reqs === Vector(Vector("1", "2")))
  }
}
