package graft.source.v2

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.model.{DBool, DInt, DObj, DStr, Json}

/** The live wire-read leg (S1/S2 over HTTP) — the source counterpart of
  * [[graft.sink.BulkHttp]]: where the reference opens a MongoDB driver
  * connection and runs the collection scan + `local.oplog.rs` tail with
  * server-side query filters (reference src/mongodb.ts:21-31,35-59),
  * this connector speaks a minimal extended-JSON-over-HTTP protocol any
  * thin sidecar in front of a real mongod (or a change-data service)
  * can serve:
  *
  *  - `GET <url>/snapshot/<db.coll>?shard=i&shards=n[&fromId=x]` —
  *    the collection scan as ndjson `{"id":…, "doc":{…}}` lines,
  *    id-ordered, hash-sharded for parallel readers; `fromId` is the
  *    server-side resume-range predicate (P2, src/mongodb.ts:35-39).
  *  - `GET <url>/oplog?from=s&to=e[&ns=…][&fromTs=t]` — oplog entries
  *    with sequence number in (s, e] as ndjson `{"seq":…, "ts":…,
  *    "op":…, "ns":…, "id":…, "doc":{…}, "fromMigrate":…}`; ns/ts
  *    filters apply SERVER-side (P3, src/mongodb.ts:46-54) without
  *    moving the sequence range, so offsets are filter-independent.
  *  - `GET <url>/oplog/latest` — `{"seq":N}`, the tail head (the
  *    latestOffset probe; the reference's awaitData cursor analog).
  *
  * The STREAMING OFFSET is the oplog sequence number — Mongo's resume
  * token made explicit — checkpointed by Structured Streaming exactly
  * like the file source's offsets, so restart/resume needs nothing
  * beyond the query's checkpointLocation. Admission
  * (`maxRowsPerTrigger`, S4) caps how far a trigger's offset may
  * advance; within an admitted range, execution parallelism comes from
  * splitting the range into `batchRows`-sized partitions, each fetched
  * by its own executor task — the driver never sees a document.
  *
  * Option surface matches [[OplogJsonSource]] where the semantics
  * overlap (`maxRowsPerTrigger`), plus `url`, `mode`
  * (snapshot | oplog), `collection`, `numShards`, `batchRows`.
  */
class MongoHttpSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (MongoHttp.modeOf(options) == "snapshot") MongoHttp.SNAPSHOT_SCHEMA
    else OplogJsonTable.SCHEMA
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new MongoHttpTable(MongoHttp.Options(
      url = Option(opts.get("url")).getOrElse(
        throw new IllegalArgumentException("MongoHttpSource requires option 'url'")),
      mode = MongoHttp.modeOf(opts),
      collection = Option(opts.get("collection")).getOrElse(""),
      numShards = Option(opts.get("numShards")).map(_.toInt).getOrElse(4),
      batchRows = Option(opts.get("batchRows")).map(_.toLong).getOrElse(10000L),
      maxRowsPerTrigger = Option(opts.get("maxRowsPerTrigger")).map(_.toLong)
        .getOrElse(Long.MaxValue),
      ns = Option(opts.get("ns")),
      fromTs = Option(opts.get("fromTs")).map(_.toLong)))
  }
}

object MongoHttp {
  val SNAPSHOT_SCHEMA: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("doc", StringType),
  ))

  /** `ns`/`fromTs` are the OPTION form of the P3 predicates: Catalyst
    * pushes batch filters into the scan, but a MicroBatchStream scan
    * gets no filter pushdown, so the stream's server-side filters
    * travel as source options — which is exactly how the reference does
    * it (the ns/ts conditions are config-driven query arguments,
    * src/mongodb.ts:46-54, not an optimizer artifact). The engine still
    * re-applies the same predicates post-scan (Compactor.streamFilters),
    * so a misbehaving server can't corrupt semantics. */
  final case class Options(url: String, mode: String, collection: String,
      numShards: Int, batchRows: Long, maxRowsPerTrigger: Long,
      ns: Option[String] = None, fromTs: Option[Long] = None)

  def modeOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("mode")).getOrElse("snapshot") match {
      case m @ ("snapshot" | "oplog") => m
      case other => throw new IllegalArgumentException(
        s"MongoHttpSource mode must be snapshot|oplog, got $other")
    }

  /** One shared client per JVM (driver and each executor): HttpClient
    * owns a selector thread pool, so per-request construction would
    * leak thread churn across thousands of partition reads. */
  private lazy val client: HttpClient = HttpClient.newHttpClient()

  /** One GET, returning the body lines. Executor-side (partition
    * readers) and driver-side (latest probe) share it; connection
    * errors propagate — a dead source is a failed task/trigger, which
    * Spark retries with its own task/trigger policy (the reference
    * crashes its process on a dead cursor, src/index.ts — task retry is
    * the strictly better behavior). */
  private[v2] def get(url: String): Iterator[String] = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(s"GET $url: status ${resp.statusCode()}")
    resp.body().linesIterator.filter(_.nonEmpty)
  }

  private[v2] def str(o: DObj, k: String): String = o.get(k) match {
    case Some(DStr(s)) => s
    case Some(other)   => other.render
    case None          => null
  }

  private[v2] def docStr(o: DObj): String = o.get("doc").map {
    case d: DObj => d.render
    case DStr(s) => s
    case other   => other.render
  }.orNull
}

class MongoHttpTable(opts: MongoHttp.Options) extends Table with SupportsRead {
  override def name(): String = s"mongo_http(${opts.url}, ${opts.mode})"
  override def schema(): StructType =
    if (opts.mode == "snapshot") MongoHttp.SNAPSHOT_SCHEMA else OplogJsonTable.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    (if (opts.mode == "snapshot") Set(TableCapability.BATCH_READ)
     else Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MongoHttpScanBuilder(opts)
}

class MongoHttpScanBuilder(opts: MongoHttp.Options)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType =
    if (opts.mode == "snapshot") MongoHttp.SNAPSHOT_SCHEMA else OplogJsonTable.SCHEMA

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // snapshot: the resume-range predicate travels to the server as
    // fromId (reference src/mongodb.ts:35-39). oplog: ns equality and
    // ts lower bounds travel as query params (src/mongodb.ts:46-54).
    val (accepted, rejected) = filters.partition {
      case GreaterThanOrEqual("id", _: String) if opts.mode == "snapshot" => true
      case EqualTo("ns", _: String) if opts.mode == "oplog" => true
      case GreaterThanOrEqual("ts", _: Long) if opts.mode == "oplog" => true
      case GreaterThan("ts", _: Long) if opts.mode == "oplog" => true
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new MongoHttpScan(opts, pushed, required)
}

/** Snapshot shard i of n (server-side hash sharding). */
case class MongoSnapshotPartition(url: String) extends InputPartition
/** Oplog sequence range (from, to]. */
case class MongoOplogPartition(url: String) extends InputPartition

final case class MongoOplogOffset(seq: Long) extends Offset {
  override def json(): String = seq.toString
}

class MongoHttpScan(opts: MongoHttp.Options, pushed: Array[Filter], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"MongoHttpScan(url=${opts.url}, mode=${opts.mode}, pushed=${pushed.mkString(",")})"

  private def oplogParams: String = {
    // pushed filters (batch) and source options (stream) both feed the
    // server-side query; conjoin ts bounds into the single strongest
    // lower bound — the reader re-checks every pushed filter anyway
    val ns = pushed.collectFirst { case EqualTo("ns", v: String) => v }.orElse(opts.ns)
    val fromTs = (pushed.collect { case GreaterThanOrEqual("ts", v: Long) => v } ++
      pushed.collect { case GreaterThan("ts", v: Long) => v + 1 } ++
      opts.fromTs).maxOption
    ns.map(n => s"&ns=${java.net.URLEncoder.encode(n, "UTF-8")}").getOrElse("") +
      fromTs.map(t => s"&fromTs=$t").getOrElse("")
  }

  private[v2] def snapshotPartitions(): Array[InputPartition] = {
    val fromId = pushed.collectFirst { case GreaterThanOrEqual("id", v: String) => v }
    val from = fromId.map(v => s"&fromId=${java.net.URLEncoder.encode(v, "UTF-8")}").getOrElse("")
    (0 until opts.numShards).map { i =>
      MongoSnapshotPartition(
        s"${opts.url}/snapshot/${opts.collection}?shard=$i&shards=${opts.numShards}$from"): InputPartition
    }.toArray
  }

  private[v2] def oplogPartitions(from: Long, to: Long): Array[InputPartition] =
    (from until to by opts.batchRows).map { s =>
      val e = math.min(s + opts.batchRows, to)
      MongoOplogPartition(s"${opts.url}/oplog?from=$s&to=$e$oplogParams"): InputPartition
    }.toArray

  override def planInputPartitions(): Array[InputPartition] =
    if (opts.mode == "snapshot") snapshotPartitions()
    else oplogPartitions(0L, MongoHttpStream.latestSeq(opts.url))

  override def createReaderFactory(): PartitionReaderFactory =
    new MongoHttpReaderFactory(opts.mode, pushed, required)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    require(opts.mode == "oplog", "only mode=oplog streams")
    new MongoHttpStream(this, opts)
  }
}

object MongoHttpStream {
  /** `GET /oplog/latest` → the current head sequence. */
  def latestSeq(url: String): Long =
    MongoHttp.get(s"$url/oplog/latest").toSeq.headOption.map { line =>
      Json.parseObj(line).get("seq") match {
        case Some(DInt(n)) => n
        case other => throw new java.io.IOException(s"bad /oplog/latest body: $other")
      }
    }.getOrElse(0L)
}

/** Streaming form: offsets are oplog sequence numbers (the resume
  * token), admission caps the per-trigger advance — since every
  * sequence is one entry, `maxRowsPerTrigger` IS the range cap (the
  * reference's docs/sec token bucket, processor.ts:31-49). */
class MongoHttpStream(scan: MongoHttpScan, opts: MongoHttp.Options)
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = MongoOplogOffset(0L)
  override def deserializeOffset(json: String): Offset = MongoOplogOffset(json.trim.toLong)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(start, limit)")

  override def getDefaultReadLimit: ReadLimit =
    if (opts.maxRowsPerTrigger == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(opts.maxRowsPerTrigger)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val head = MongoHttpStream.latestSeq(opts.url)
    val from = start.asInstanceOf[MongoOplogOffset].seq
    val cap = limit match {
      case m: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        math.min(head, from + m.maxRows())
      case c: org.apache.spark.sql.connector.read.streaming.CompositeReadLimit =>
        c.getReadLimits.collect {
          case m: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
            from + m.maxRows()
        }.foldLeft(head)(math.min)
      case _ => head
    }
    MongoOplogOffset(math.max(from, cap))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    scan.oplogPartitions(
      start.asInstanceOf[MongoOplogOffset].seq,
      end.asInstanceOf[MongoOplogOffset].seq)

  override def createReaderFactory(): PartitionReaderFactory =
    scan.createReaderFactory()

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class MongoHttpReaderFactory(mode: String, pushed: Array[Filter], required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case MongoSnapshotPartition(url) => new MongoSnapshotReader(url, required)
      case MongoOplogPartition(url)    => new MongoOplogReader(url, pushed, required)
    }
}

/** Snapshot lines `{"id":…, "doc":{…}}` → (id, doc) rows. */
class MongoSnapshotReader(url: String, required: StructType)
    extends PartitionReader[InternalRow] {
  private val lines = MongoHttp.get(url)
  private var current: InternalRow = _
  override def next(): Boolean = {
    while (lines.hasNext) {
      val line = lines.next()
      // per-event error contract: malformed lines drop, the scan lives
      scala.util.Try(Json.parseObj(line)).toOption.foreach { o =>
        current = new GenericInternalRow(required.fields.map[Any] { f =>
          f.name match {
            case "id"  => UTF8String.fromString(MongoHttp.str(o, "id"))
            case "doc" => UTF8String.fromString(MongoHttp.docStr(o))
          }
        })
        return true
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** Oplog lines → the [[OplogJsonTable.SCHEMA]] rows; every pushed
  * filter re-checks locally (the server already filtered — re-checking
  * keeps a misbehaving sidecar from corrupting resume semantics). */
class MongoOplogReader(url: String, pushed: Array[Filter], required: StructType)
    extends PartitionReader[InternalRow] {
  private val lines = MongoHttp.get(url)
  private var current: InternalRow = _
  private val nsEqs = pushed.collect { case EqualTo("ns", v: String) => v }
  private val tsGes = pushed.collect { case GreaterThanOrEqual("ts", v: Long) => v }
  private val tsGts = pushed.collect { case GreaterThan("ts", v: Long) => v }

  override def next(): Boolean = {
    while (lines.hasNext) {
      val line = lines.next()
      scala.util.Try(Json.parseObj(line)).toOption
        .filter(_.get("ts").exists(_.isInstanceOf[DInt])).foreach { o =>
        val ts = o.get("ts") match { case Some(DInt(l)) => l; case _ => 0L }
        val ns = MongoHttp.str(o, "ns")
        if (nsEqs.forall(_ == ns) && tsGes.forall(ts >= _) && tsGts.forall(ts > _)) {
          current = new GenericInternalRow(required.fields.map[Any] { f =>
            f.name match {
              case "ts" => ts
              case "op" => UTF8String.fromString(MongoHttp.str(o, "op"))
              case "ns" => UTF8String.fromString(ns)
              case "id" => UTF8String.fromString(MongoHttp.str(o, "id"))
              case "doc" => UTF8String.fromString(MongoHttp.docStr(o))
              case "fromMigrate" => o.get("fromMigrate") match {
                case Some(DBool(b)) => b
                case _              => false
              }
            }
          })
          return true
        }
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
