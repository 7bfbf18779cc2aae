package graft.sink

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import graft.model.{DObj, DStr, EngineConfig}

/** The live index-DDL leg (reference src/indices.ts:19-57): on startup
  * the reference walks `elasticsearch.indices` doing exists→create for
  * each declared index (with the blue/green `indexNameSuffix` appended)
  * and then puts every task's load mapping — all over the ES HTTP API.
  * [[Ddl]] models the same contract as catalog tables; this object IS
  * the HTTP contract, so the engine can be pointed at a real
  * Elasticsearch end-to-end (the DDL counterpart of [[BulkHttp]], which
  * delivered the data leg in r14).
  *
  * REST shapes (the stable ES surface since 6.x):
  *  - exists:     HEAD /<index>            → 200 yes / 404 no
  *  - create:     PUT  /<index>            body = IndicesCreateParams.body
  *  - putMapping: PUT  /<index>/_mapping   (…/<type> when the config
  *    declares a pre-7 doc type, as the reference's 5.x-era configs do)
  *
  * Failure semantics mirror [[BulkHttp]]: 429/503/5xx and transport
  * errors retry on the same exponential backoff schedule; any other
  * non-2xx fails fast ([[DdlFailedException]]) so the pipeline never
  * starts against a cluster that rejected its DDL — with ONE deliberate
  * exception: a create that loses a race (ES answers 400
  * `resource_already_exists_exception`) counts as exists, because two
  * engine instances initializing concurrently is the reference's normal
  * multi-task deployment.
  *
  * This is driver-side, O(indices + tasks) requests, once per startup —
  * no scale concern; the data path stays on the executor-side
  * [[BulkHttp]] delivery.
  */
object DdlHttp {

  final case class Policy(maxRetries: Int = 3, backoffMs: Long = 50)

  final class DdlFailedException(msg: String) extends RuntimeException(msg)

  /** What startup DDL did — for logs and specs. */
  final case class DdlReport(created: Vector[String], mappedIndices: Vector[String])

  private def endpoint(base: URI, path: String): URI = {
    val b = base.toString.stripSuffix("/")
    URI.create(s"$b/$path")
  }

  private def request(
      client: HttpClient,
      method: String,
      uri: URI,
      body: Option[String],
      policy: Policy,
      what: String): HttpResponse[String] = {
    var attempt = 0
    while (true) {
      val resp =
        try {
          val b = HttpRequest.newBuilder(uri)
          val req = (body match {
            case Some(s) => b.header("Content-Type", "application/json")
              .method(method, HttpRequest.BodyPublishers.ofString(s, StandardCharsets.UTF_8))
            case None => b.method(method, HttpRequest.BodyPublishers.noBody())
          }).build()
          Some(client.send(req, HttpResponse.BodyHandlers.ofString()))
        } catch { case _: java.io.IOException => None }
      val retryable = resp.forall(r => r.statusCode() == 429 || r.statusCode() >= 500)
      if (!retryable) return resp.get
      attempt += 1
      if (attempt > policy.maxRetries)
        throw new DdlFailedException(
          s"$what: ${resp.map(r => s"status ${r.statusCode()}").getOrElse("transport error")} " +
            s"after $attempt attempts ($method $uri)")
      Thread.sleep(policy.backoffMs << (attempt - 1))
    }
    throw new IllegalStateException("unreachable")
  }

  /** HEAD /<index> (reference indices.exists, src/indices.ts:51-57). */
  def exists(client: HttpClient, base: URI, index: String,
      policy: Policy = Policy()): Boolean = {
    val r = request(client, "HEAD", endpoint(base, index), None, policy, s"exists $index")
    r.statusCode() match {
      case 200 => true
      case 404 => false
      case s => throw new DdlFailedException(s"exists $index: unexpected status $s")
    }
  }

  /** PUT /<index> (reference indices.create, src/indices.ts:35-41).
    * Returns false when the index already existed (lost create race). */
  def createIndex(client: HttpClient, base: URI, index: String, body: String,
      policy: Policy = Policy()): Boolean = {
    val r = request(client, "PUT", endpoint(base, index), Some(body), policy, s"create $index")
    if (r.statusCode() / 100 == 2) true
    else if (r.statusCode() == 400 && r.body().contains("resource_already_exists_exception")) false
    else throw new DdlFailedException(
      s"create $index: status ${r.statusCode()}: ${r.body().take(200)}")
  }

  /** PUT /<index>/_mapping[/<type>] (reference indices.putMapping,
    * src/indices.ts:43-49). */
  def putMapping(client: HttpClient, base: URI, index: String, esType: String,
      body: String, policy: Policy = Policy()): Unit = {
    val path =
      if (esType.isEmpty || esType == "_doc") s"$index/_mapping"
      else s"$index/_mapping/$esType"
    val r = request(client, "PUT", endpoint(base, path), Some(body), policy,
      s"putMapping $index")
    if (r.statusCode() / 100 != 2)
      throw new DdlFailedException(
        s"putMapping $index: status ${r.statusCode()}: ${r.body().take(200)}")
  }

  /** The reference's `Indices.init` over HTTP (src/indices.ts:19-33):
    * exists→create for every declared index with the blue/green suffix,
    * then put every task's mapping. Order matters and matches the
    * reference — all creates first, then all mappings. */
  def initFromConfig(
      config: EngineConfig,
      base: URI,
      client: HttpClient = HttpClient.newHttpClient(),
      policy: Policy = Policy()): DdlReport = {
    val suffix = config.controls.indexNameSuffix
    val created = config.elasticsearchIndices.flatMap { params =>
      val name = params.get("index").collect { case DStr(s) => s }.getOrElse(
        throw new DdlFailedException("elasticsearch.indices entry without an index name"))
      val index = name + suffix
      val body = params.get("body").collect { case d: DObj => d.render }.getOrElse("{}")
      if (!exists(client, base, index, policy) && createIndex(client, base, index, body, policy))
        Some(index)
      else None
    }
    val mapped = config.tasks.map { td =>
      val index = td.load.index + suffix
      val body = td.load.mappingBody.map(_.render).getOrElse("{}")
      putMapping(client, base, index, td.load.esType, body, policy)
      index
    }
    DdlReport(created.toVector, mapped.toVector)
  }
}
