package graft.source

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The live snapshot leg at its design point: a shard is TERABYTES, so
  * the reader must stream — one page in flight, one buffered line in
  * memory — never a whole response. Two proofs:
  *
  *  1. a multi-hundred-MB shard, GENERATED on the fly server-side
  *     (neither side ever holds the shard), read through the paginated
  *     reader to an exact row count;
  *  2. an ENDLESS unpaginated response (a sidecar that ignores `limit`
  *     and never stops writing): a LIMIT query completes and tears the
  *     connection down — impossible under the old whole-body
  *     `ofString` read, which waited for a body end that never came.
  */
class MongoHttpStreamingBodySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def param(q: String, k: String): Option[String] =
    Option(q).toSeq.flatMap(_.split("&")).collectFirst {
      case kv if kv.startsWith(s"$k=") =>
        java.net.URLDecoder.decode(kv.drop(k.length + 1), "UTF-8")
    }

  test("a ~330 MB generated shard streams through pagination to an exact count") {
    val total = 1500000
    val pad = "x" * 150
    def line(i: Int): String = f"""{"id":"d$i%08d","doc":{"_id":"d$i%08d","pad":"$pad","value":$i}}"""
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val requests = new java.util.concurrent.atomic.AtomicInteger
    server.createContext("/", (ex: HttpExchange) => {
      val q = ex.getRequestURI.getQuery
      requests.incrementAndGet()
      // fromId is INCLUSIVE: index of the cursor row itself
      val start = param(q, "fromId").map(_.drop(1).toInt).getOrElse(0)
      val limit = param(q, "limit").map(_.toInt).getOrElse(Int.MaxValue)
      val end = math.min(total.toLong, start.toLong + limit).toInt
      ex.sendResponseHeaders(200, 0) // chunked: the server streams too
      val w = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(ex.getResponseBody, StandardCharsets.UTF_8), 1 << 16)
      (start until end).foreach { i => w.write(line(i)); w.write("\n") }
      w.close(); ex.close()
    })
    server.start()
    try {
      val df = spark.read
        .format("graft.source.v2.MongoHttpSource")
        .option("url", s"http://127.0.0.1:${server.getAddress.getPort}")
        .option("mode", "snapshot").option("collection", "db.big")
        .option("numShards", "1").option("batchRows", "100000")
        .load()
      assert(df.count() === total)
      // 15 full pages + dup re-sends + the final short page
      assert(requests.get() >= 15, s"expected chained pages, got ${requests.get()} requests")
    } finally server.stop(0)
  }

  test("an endless response (limit-ignoring sidecar) still serves a LIMIT query incrementally") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      ex.sendResponseHeaders(200, 0)
      val w = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(ex.getResponseBody, StandardCharsets.UTF_8), 1 << 16)
      try {
        var i = 0
        while (i < 50000000) { // bounded only as a runaway backstop
          w.write(f"""{"id":"e$i%09d","doc":{"_id":"e$i%09d"}}""")
          w.write("\n")
          if (i % 1024 == 0) w.flush() // keep lines arriving at the client
          i += 1
        }
      } catch { case _: java.io.IOException => () } // client hung up: expected
      finally ex.close()
    })
    server.start()
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val rows = Await.result(Future {
        spark.read
          .format("graft.source.v2.MongoHttpSource")
          .option("url", s"http://127.0.0.1:${server.getAddress.getPort}")
          .option("mode", "snapshot").option("collection", "db.endless")
          .option("numShards", "1")
          .load()
          .limit(5).collect()
      }, 120.seconds)
      assert(rows.length === 5)
      assert(rows.map(_.getString(0)).toSeq === (0 until 5).map(i => f"e$i%09d"))
    } finally server.stop(0)
  }
}
