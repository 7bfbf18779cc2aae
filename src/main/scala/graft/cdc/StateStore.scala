package graft.cdc

import java.nio.file.{Files, Paths => JPaths, StandardOpenOption}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.{DObj, DStr, Json}

/** Engine-owned sink state — the architectural replacement for the
  * reference's sink read-back (S6/S7, reference src/elasticsearch.ts:30-148)
  * and its idempotent-overwrite recovery contract (O10,
  * reference src/processor.ts:233-243).
  *
  * State schema: `(id string, doc string, parent string, ts long)` where
  * `doc` is the sink-shaped JSON document including `_id`.
  *
  * [[applyIRs]] is a MERGE: last-writer-wins by `ts` with upsert/delete
  * semantics — replay-safe (O9: the reference re-reads a 10 s overlap on
  * restart and relies on idempotent upserts; here the ts guard makes
  * replays exact no-ops). Expressed relationally (union + window) so
  * Catalyst plans a single shuffle on `id`; on a real deployment the same
  * logic is one Delta/Iceberg `MERGE INTO` inside `foreachBatch`.
  *
  * Persistence is versioned parquet directories (`v_0, v_1, …` + a
  * VERSION pointer file): plain parquet cannot be overwritten while being
  * read, and versioning gives atomic swap + time travel, mimicking a
  * table format without adding dependencies.
  */
object StateStore {

  val schemaCols = Seq("id", "doc", "parent", "ts")

  def empty(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("id", StringType),
        StructField("doc", StringType),
        StructField("parent", StringType),
        StructField("ts", LongType),
      )))
  }

  /** MERGE the IR batch into the state: per id keep the latest (ts) among
    * {existing state row, IR rows}; IR wins ts ties (idempotent replay of
    * the same event re-applies the same value); deletes remove the key.
    */
  def applyIRs(state: DataFrame, irs: Dataset[IRRow]): DataFrame = {
    val irDf = irs.toDF()
      .withColumn("doc", sinkDocUdf(col("id"), col("data")))
      .select(col("id"), col("doc"), col("parent"), col("ts"),
        col("action"), lit(1).as("__prio"))
    val stDf = state.select(col("id"), col("doc"), col("parent"), col("ts"),
      lit("upsert").as("action"), lit(0).as("__prio"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("ts").desc, col("__prio").desc)
    stDf.union(irDf)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("action") =!= "delete")
      .select(schemaCols.map(col): _*)
  }

  /** Sink doc = `{_id: id} ++ data` — what the reference's ES `index` op
    * materializes (`_id` metadata + `_source` data,
    * reference src/processor.ts:233-241, src/elasticsearch.ts:150-157). */
  private val sinkDocUdf = udf { (id: String, data: String) =>
    if (data == null) null
    else DObj(("_id" -> DStr(id)) +: Json.parseObj(data).fields.filterNot(_._1 == "_id")).render
  }

  // ---- versioned parquet persistence ----

  private def versionFile(dir: String) = JPaths.get(dir, "VERSION")

  def currentVersion(dir: String): Option[Int] = {
    val f = versionFile(dir)
    if (Files.exists(f)) Some(new String(Files.readAllBytes(f)).trim.toInt) else None
  }

  def read(spark: SparkSession, dir: String): DataFrame =
    currentVersion(dir) match {
      case Some(v) => spark.read.parquet(s"$dir/v_$v")
      case None    => empty(spark)
    }

  /** Write the next version and atomically advance the pointer. */
  def write(state: DataFrame, dir: String): Int = {
    val next = currentVersion(dir).map(_ + 1).getOrElse(0)
    state.write.mode("overwrite").parquet(s"$dir/v_$next")
    Files.createDirectories(JPaths.get(dir))
    val tmp = JPaths.get(dir, ".VERSION.tmp")
    Files.write(tmp, next.toString.getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, versionFile(dir), java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    next
  }
}
