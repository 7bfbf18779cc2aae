package graft.llm

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{NamedQuery, Tables}

/** Multimodal-column plumbing: image/audio/video ride as opaque `binary`
  * columns with typed metadata; decode/feature-extraction runs as a
  * partition-wise operator over batches of byte arrays.
  *
  * The decode itself is STUBBED (no media libraries in this
  * environment): [[FakeDecoder.decode]] derives deterministic fake
  * dimensions from the payload bytes. Everything Spark-side — the binary
  * schema, the partition-wise batching, the metadata struct the decoder
  * returns, the partition sizing — is real: swapping in a JNI/FFI
  * decoder changes one function.
  *
  * Scale: decode is the canonical CPU-heavy map stage. No shuffle at
  * all; partition sizing (`spark.sql.files.maxPartitionBytes`) controls
  * batch memory; at 100 TB this runs as a pure scan with
  * `repartition(n)` only if the source files skew.
  */
object Multimodal {

  /** Decoded-media metadata (what a real image decoder would return). */
  final case class MediaMeta(
      doc_id: Long, byte_len: Long, width: Int, height: Int, channels: Int)

  object FakeDecoder {
    /** STUB decode: deterministic pseudo-metadata from the payload.
      * Real implementation would parse the container header. */
    def decode(docId: Long, payload: Array[Byte]): MediaMeta = {
      val h = payload.foldLeft(1125899906842597L)((acc, b) => 31 * acc + b)
      val w = 64 + math.floorMod(h, 1024).toInt
      MediaMeta(docId, payload.length.toLong, w,
        64 + math.floorMod(h >> 10, 1024).toInt,
        1 + math.floorMod(h >> 20, 4).toInt)
    }
  }

  /** Attach a synthetic binary column (documents' text bytes standing in
    * for the media payload) and run the partition-wise decode. */
  def decodeMeta(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.table(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    implicit val enc = Encoders.product[MediaMeta]
    docs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])](Encoders.product[(Long, Array[Byte])])
      .mapPartitions { it => it.map { case (id, bytes) => FakeDecoder.decode(id, bytes) } }
      .toDF()
      .orderBy(col("doc_id"))
  }
}

object MultimodalQueries {
  def queries: Vector[NamedQuery] = Vector(
    NamedQuery("multimodal_decode_meta", (s, d) => Multimodal.decodeMeta(s, d), None),
  )
}
