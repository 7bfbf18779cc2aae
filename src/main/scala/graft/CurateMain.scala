package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Batch corpus-curation binary — the LLM-pipeline counterpart of the
  * CDC daemon ([[Main]]): one runnable job that takes a raw document
  * corpus and materializes the curated, split-assigned training corpus
  * plus a per-stage accounting manifest.
  *
  *   spark-submit --class graft.CurateMain engine.jar <corpusDir> <outDir>
  *
  * Stages (each is an oracle-checked harness query in its own right;
  * this binary pins their composition to disk):
  *  1. decision table — `pipeline_curate_corpus`: exact-dedup
  *     canonical, Gopher repetition gate, benchmark decontamination;
  *  2. split assignment — `pipeline_split_assign`: deterministic
  *     hash-slice train/val/test (stable under corpus growth);
  *  3. write — curated docs as parquet partitioned by split (so a
  *     training run reads `split=train` with partition pruning);
  *  4. manifest — per-stage counts as JSON, the audit trail a data
  *     pipeline publishes with every corpus release.
  *
  * Scale: the decision table is the measured query (hash + broadcast
  * joins, no all-pairs), the split is a pure projection, the write is
  * one exchange on the partition key. Nothing collects to the driver
  * but the manifest's handful of counts.
  */
object CurateMain {

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.CurateMain <corpusDir> <outDir>")
      sys.exit(2)
    }
    val Array(corpusDir, outDir) = args.take(2)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-curate")
      .withExtensions(new graft.expressions.GraftExtensions)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try println(run(spark, corpusDir, outDir))
    finally spark.stop()
  }

  /** Runs the curation DAG; returns the manifest JSON (also written to
    * `<outDir>/manifest.json`, corpus to `<outDir>/corpus/split=...`). */
  def run(spark: SparkSession, corpusDir: String, outDir: String): String = {
    val docs = graft.ops.Tables.table(spark, corpusDir, "documents")
    val decisions = SparkEntry.queries("pipeline_curate_corpus")(spark, corpusDir)
    val splits = SparkEntry.queries("pipeline_split_assign")(spark, corpusDir)
      .select(col("doc_id"), col("split"))

    val curated = docs
      .join(decisions.filter(col("selected")).select("doc_id"), Seq("doc_id"))
      .join(splits, Seq("doc_id"))
    curated.write.mode("overwrite")
      .partitionBy("split").parquet(s"$outDir/corpus")

    // one pass over the decision table for the funnel counts; split
    // counts read back from the written corpus so the manifest audits
    // what actually landed on disk
    val f = decisions.agg(
      count(lit(1)).as("n_ingested"),
      sum(when(col("is_canonical"), 1L).otherwise(0L)).as("n_canonical"),
      sum(when(col("quality_ok"), 1L).otherwise(0L)).as("n_quality_ok"),
      sum(when(col("contaminated"), 1L).otherwise(0L)).as("n_contaminated"),
      sum(when(col("within_source_cap"), 1L).otherwise(0L)).as("n_within_cap"),
      sum(when(col("selected"), 1L).otherwise(0L)).as("n_selected")).head()
    val perSplit = spark.read.parquet(s"$outDir/corpus")
      .groupBy("split").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)

    // assemble as field list + one mkString so the separator vanishes
    // when perSplit is empty (no trailing comma), and JSON-escape the
    // interpolated path (quotes/backslashes would break the document)
    def jsonStr(v: String): String =
      "\"" + v.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val fields = Seq(
      s""""corpus":${jsonStr(corpusDir)}""",
      s""""n_ingested":${f.getLong(0)}""",
      s""""n_canonical":${f.getLong(1)}""",
      s""""n_quality_ok":${f.getLong(2)}""",
      s""""n_contaminated":${f.getLong(3)}""",
      s""""n_within_cap":${f.getLong(4)}""",
      s""""n_selected":${f.getLong(5)}""") ++
      perSplit.map { case (s, n) => s""""n_$s":$n""" }
    val manifest = fields.mkString("{", ",", "}")
    Files.createDirectories(Paths.get(outDir))
    Files.writeString(Paths.get(s"$outDir/manifest.json"), manifest)
    manifest
  }
}
