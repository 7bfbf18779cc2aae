package graft.source.v2

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 sink emitting Elasticsearch `_bulk` bodies — the
  * concrete form of the L1 load seam (reference src/processor.ts:225-258):
  * each IR row becomes an action line (`{"index":{"_id":…,"_parent":…}}`
  * or `{"delete":{…}}`) followed, for upserts, by the document source.
  * What the es-hadoop connector ships over HTTP, this writes as
  * newline-delimited bulk files — one per task, with the standard
  * stage-then-commit protocol:
  *
  *  - each DataWriter streams to an invisible staging file
  *    (`.part-<partition>-<task>`);
  *  - task `commit()` atomically renames it visible (`part-…`) — retried
  *    or speculative tasks abort and delete their staging file, so
  *    exactly one attempt's output survives (the file-sink form of the
  *    idempotent-upsert recovery contract O10);
  *  - job `commit()` drops a `_SUCCESS` marker.
  *
  * Input schema: (action, id, data, parent, ts) — IR rows.
  *
  * Usage: `irs.write.format("graft.source.v2.BulkJsonSink")
  *   .option("path", dir).option("index", "idx").option("type", "doc")
  *   .mode("append").save()`
  */
class BulkJsonSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BulkJsonSink.EXPECTED
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BulkJsonTable(properties.get("path"),
      Option(properties.get("index")).getOrElse("index"),
      Option(properties.get("type")).getOrElse("_doc"),
      Option(properties.get("compress")).exists(_.toBoolean))
}

object BulkJsonSink {
  import org.apache.spark.sql.types._
  val EXPECTED: StructType = StructType(Seq(
    StructField("action", StringType),
    StructField("id", StringType),
    StructField("data", StringType),
    StructField("parent", StringType),
    StructField("ts", LongType),
  ))

  private[v2] def esc(s: String): String =
    graft.model.Json.render(graft.model.DStr(s))
}

class BulkJsonTable(path: String, index: String, esType: String, compress: Boolean = false)
    extends Table with SupportsWrite {
  override def name(): String = s"bulk_json($path)"
  override def schema(): StructType = BulkJsonSink.EXPECTED
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE).asJava
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BulkBatchWrite(path, index, esType, compress)
      }
    }
}

final case class BulkCommit(finalFile: String) extends WriterCommitMessage

class BulkBatchWrite(path: String, index: String, esType: String, compress: Boolean = false) extends BatchWrite {
  // driver-side: resolve the session conf here and ship it with the
  // factory so executor writers hit the same FileSystem (scheme,
  // credentials) the job was planned against
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new BulkWriterFactory(path, index, esType, compress,
      new SerializableHadoopConf(FsIO.driverConf))
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // a zero-partition write runs no task writers, so the directory may
    // not exist yet — an empty successful job still gets its marker
    val dir = new org.apache.hadoop.fs.Path(path)
    val fileSystem = FsIO.rawFs(dir, FsIO.driverConf)
    fileSystem.mkdirs(dir)
    fileSystem.create(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"), true).close()
  }
  // job abort must also undo already-committed tasks, or a retried job
  // would duplicate their output next to its own
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fileSystem = FsIO.rawFs(new org.apache.hadoop.fs.Path(path), FsIO.driverConf)
    messages.foreach {
      case BulkCommit(f) => fileSystem.delete(new org.apache.hadoop.fs.Path(f), false)
      case _             => ()
    }
  }
}

class BulkWriterFactory(path: String, index: String, esType: String, compress: Boolean,
    conf: SerializableHadoopConf) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new BulkDataWriter(path, index, esType, partitionId, taskId, compress, conf.value)
}

class BulkDataWriter(path: String, index: String, esType: String, partitionId: Int,
    taskId: Long, compress: Boolean,
    hadoopConf: org.apache.hadoop.conf.Configuration)
    extends DataWriter[InternalRow] {
  import BulkJsonSink.esc

  private val dir = new org.apache.hadoop.fs.Path(path)
  // raw (checksum-free) FS: the directory is consumed by an external
  // bulk loader, so `.crc` side-files next to the bodies are noise
  private val fileSystem = FsIO.rawFs(dir, hadoopConf)
  fileSystem.mkdirs(dir)
  private val staging = new org.apache.hadoop.fs.Path(dir, f".part-$partitionId%05d-$taskId")
  // gzip bodies ship as Content-Encoding: gzip bulk requests — 5-10x
  // smaller on the wire for JSON; each part file stays one request
  private val out = {
    val raw: java.io.OutputStream = fileSystem.create(staging, true)
    new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      if (compress) new java.util.zip.GZIPOutputStream(raw) else raw,
      java.nio.charset.StandardCharsets.UTF_8))
  }

  override def write(row: InternalRow): Unit = {
    val action = row.getUTF8String(0).toString
    val id = row.getUTF8String(1).toString
    val parent = if (row.isNullAt(3)) None else Some(row.getUTF8String(3).toString)
    val meta = new StringBuilder()
      .append("{\"").append(if (action == "delete") "delete" else "index")
      .append("\":{\"_index\":").append(esc(index))
      .append(",\"_type\":").append(esc(esType))
      .append(",\"_id\":").append(esc(id))
    parent.foreach(p => meta.append(",\"_parent\":").append(esc(p)))
    meta.append("}}")
    out.write(meta.toString); out.newLine()
    if (action != "delete") {
      val doc = if (row.isNullAt(2)) "{}" else row.getUTF8String(2).toString
      out.write(doc); out.newLine()
    }
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    val suffix = if (compress) ".bulk.gz" else ".bulk"
    val fin = new org.apache.hadoop.fs.Path(dir, f"part-$partitionId%05d-$taskId$suffix")
    // Hadoop rename: atomic on HDFS/local, never overwrites — a false
    // return means another attempt's file landed first, which the
    // commit coordinator should have prevented, so surface it
    if (!fileSystem.rename(staging, fin))
      throw new java.io.IOException(s"rename $staging -> $fin failed (already committed?)")
    BulkCommit(fin.toString)
  }

  override def abort(): Unit = {
    out.close()
    fileSystem.delete(staging, false)
  }

  override def close(): Unit = ()
}
