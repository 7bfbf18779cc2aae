package graft.llm

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Trained BPE tokenizer (r14 verdict #4) — `text_bpe_merge_step`'s
  * single oracle-checked step iterated to a merge LIST under a fixed
  * budget, with the [[LrModel]] sidecar discipline applied to the
  * result (train once per corpus, persist, restart = zero retrain).
  *
  * Training follows Sennrich et al. 2016's weighted-vocabulary shape:
  * the corpus collapses to (distinct word, frequency) ONCE (Heaps-
  * bounded — vocabulary grows ~√corpus), and every round runs over
  * that tiny relation only: count adjacent token pairs weighted by
  * word frequency, take the argmax (count desc, pair asc — the
  * text_bpe_merge_step ordering, so round 1's choice IS that query's
  * rank-1 row), apply the merge, repeat. At 100 TB the corpus is
  * touched exactly once; the per-round passes are vocabulary-sized.
  *
  * Token representation — the cross-engine determinism contract: a
  * word encodes as each token wrapped in control markers
  * (`\u0001token\u0002`), and applying merge (a, b) is ONE left-to-
  * right non-overlapping string replace of `␁a␂␁b␂` with `␁ab␂`.
  * Both Spark's `replace` and DuckDB's `replace` scan left-to-right
  * non-overlapping, so tokenization is bit-identical and the
  * `text_tokens_bpe` oracle simply unrolls the trained merge list as
  * a replace chain (the codebookSql literal-inlining pattern). The
  * wrapper markers make cross-token false matches impossible and
  * make the token count a character count (number of `␂` markers).
  *
  * Per-round weighted token totals are recorded; they are strictly
  * non-increasing (every merge application only fuses adjacent
  * tokens) — BpeModelSpec pins it, alongside restart-zero-retrain.
  */
object BpeModel {

  /** Fixed merge budget — how a real pipeline bounds tokenizer
    * training (the LrModel maxRounds discipline). Training also stops
    * early when no adjacent pair remains. */
  val mergeBudget = 64

  val U1 = "\u0001"
  val U2 = "\u0002"

  /** Bumped on every actual training loop; the restart spec pins that
    * a second session loads the sidecar instead of bumping this. */
  @volatile var trainCount: Long = 0L

  private def fileFor(dir: String): Path =
    CodebookStore.indexRoot.resolve(
      s"bpe_merges_${dir.replaceAll("[^A-Za-z0-9._-]", "_")}.tsv")

  /** word → wrapped single-char tokens (`␁c␂` per character). */
  def encode(c: Column): Column =
    regexp_replace(c, "(.)", U1 + "$1" + U2)

  /** Apply the ordered merge list — one replace per merge, the exact
    * chain the oracle SQL unrolls. */
  def applyMerges(c: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(c) { case (acc, (a, b)) =>
      call_function("replace", acc,
        lit(U1 + a + U2 + U1 + b + U2), lit(U1 + a + b + U2))
    }

  /** Token count of a wrapped string = number of `␂` markers. */
  def tokenCount(c: Column): Column =
    length(c) - length(call_function("replace", c, lit(U2), lit("")))

  /** The token array of a wrapped string (markers stripped) — split on
    * the inter-token `␂␁` boundary, strip the outer markers. */
  def tokensCol(c: Column): Column =
    transform(split(c, U2 + U1),
      x => regexp_replace(x, lit(s"[$U1$U2]"), lit("")))

  private def save(p: Path, stamp: String,
      merges: Vector[(String, String)], tokens: Vector[Long]): Unit = {
    Files.createDirectories(p.getParent)
    val tmp = Files.createTempFile(p.getParent, p.getFileName.toString, ".tmp")
    val lines = s"#corpus_stamp=$stamp" +:
      s"#tokens_per_round=${tokens.mkString(",")}" +:
      merges.map { case (a, b) => s"$a\t$b" }
    Files.write(tmp, lines.asJava)
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def load(p: Path,
      stamp: String): Option[(Vector[(String, String)], Vector[Long])] =
    if (!Files.exists(p)) None
    else {
      val lines = Files.readAllLines(p).asScala.toVector
      if (!lines.headOption.contains(s"#corpus_stamp=$stamp")) None
      else {
        val tokens = lines(1).stripPrefix("#tokens_per_round=").split(",")
          .filter(_.nonEmpty).map(_.toLong).toVector
        val merges = lines.drop(2).map { l =>
          val Array(a, b) = l.split("\t", 2); (a, b)
        }
        Some((merges, tokens))
      }
    }

  /** One training loop over the weighted vocabulary. Returns the
    * ordered merges and the weighted total token count after each. */
  private[llm] def train(spark: SparkSession, dir: String,
      budget: Int = mergeBudget): (Vector[(String, String)], Vector[Long]) = {
    var state = graft.ops.Tables.table(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("wf"))
      .select(encode(col("w")).as("s"), col("wf"))
      .localCheckpoint()
    val merges = Vector.newBuilder[(String, String)]
    val totals = Vector.newBuilder[Long]
    var round = 0
    var done = false
    while (round < budget && !done) {
      val top = state.withColumn("toks", tokensCol(col("s")))
        .filter(size(col("toks")) >= 2)
        .select(col("wf"), explode(expr(
          "transform(sequence(1, size(toks) - 1), i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))")).as("pair"))
        .groupBy(col("pair")).agg(sum(col("wf")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair")).limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val Array(a, b) = top(0).getString(0).split(" ", 2)
        merges += ((a, b))
        // apply + pin: every later round reads the tiny merged state,
        // never a 64-deep replace lineage
        state = state
          .withColumn("s", applyMerges(col("s"), Seq((a, b))))
          .localCheckpoint()
        totals += state
          .agg(sum(tokenCount(col("s")).cast("long") * col("wf"))).head().getLong(0)
        round += 1
      }
    }
    (merges.result(), totals.result())
  }

  def loadOrTrain(spark: SparkSession, dir: String): Vector[(String, String)] =
    loadOrTrainWithTotals(spark, dir)._1

  def loadOrTrainWithTotals(spark: SparkSession,
      dir: String): (Vector[(String, String)], Vector[Long]) = {
    val stamp = CorpusStamp.of(spark, dir, "documents", "doc_id").token
    val p = fileFor(dir)
    load(p, stamp).getOrElse {
      val (merges, totals) = train(spark, dir)
      trainCount += 1
      save(p, stamp, merges, totals)
      (merges, totals)
    }
  }
}
