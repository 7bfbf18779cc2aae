package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{NamedQuery, Tables}

/** Embedding similarity search over the `embeddings` table
  * (64-dim float vectors).
  *
  * Two paths, mirroring how ANN systems scale:
  *  - [[cosineTopK]] — brute-force cosine top-k for a bounded query set:
  *    broadcast the (small) query side, one pass over candidates, per-query
  *    top-k via window. Exact; O(|Q| * N) dot products; the right baseline
  *    and the correctness oracle for any ANN index.
  *  - [[lshTopK]] — random-hyperplane LSH: 16-bit signatures bucket the
  *    candidates; only same-bucket pairs get exact re-ranking. At 100 TB
  *    the bucket join replaces the full scan — sub-linear candidates at
  *    the cost of recall (rows-only check; planes are seed-deterministic).
  */
object SimilarityQueries {

  def queries: Vector[NamedQuery] = Vector(
    NamedQuery("sim_cosine_topk", cosineTopK, Some(cosineTopKSql)),
    NamedQuery("sim_lsh_topk", lshTopK, None),
  )

  private val dot =
    "aggregate(zip_with(%s, %s, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
  import graft.expressions.VectorFunctions.{dot => ndot} // native codegen'd form

  // ---------------------------------------------------------------
  private def cosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("nrm", sqrt(ndot(col("v"), col("v"))))
    val q = e.select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      .filter(col("q_id") < 8)
    val cand = e.select(col("vec_id").as("n_id"), col("v").as("nv"), col("nrm").as("nn"))
    val sims = cand.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("sim",
        graft.ops.Registry.rnd(ndot(col("qv"), col("nv")) / (col("qn") * col("nn")), 4))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("n_id"), col("sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  private val cosineTopKSql =
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v,
      |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      |  FROM embeddings
      |), sims AS (
      |  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
      |    CAST(round(CAST(list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS DECIMAL(18,8)), 4) AS DOUBLE) AS sim
      |  FROM e a JOIN e b ON a.vec_id < 8 AND b.vec_id <> a.vec_id
      |), ranked AS (
      |  SELECT q_id, n_id, sim,
      |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
      |  FROM sims
      |)
      |SELECT q_id, rank, n_id, sim FROM ranked WHERE rank <= 5
      |ORDER BY q_id, rank""".stripMargin

  // ---------------------------------------------------------------
  // Seed-deterministic random hyperplanes (so reruns agree).
  private def planes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  private def lshTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("nrm", sqrt(ndot(col("v"), col("v"))))
    val pl = typedLit(planes(16, 64))
    // 16-bit signature: bit i = (v . plane_i) > 0
    val sig = e.withColumn("planes", pl)
      .withColumn("sig", expr(
        """aggregate(
          |  transform(planes, p -> if(aggregate(zip_with(v, p, (x, y) -> x * y), 0D, (acc, x) -> acc + x) > 0D, 1, 0)),
          |  (0L, 0),
          |  (acc, b) -> (acc.col1 + if(b = 1, shiftleft(1L, acc.col2), 0L), acc.col2 + 1),
          |  acc -> acc.col1)""".stripMargin))
      .select(col("vec_id"), col("v"), col("nrm"), col("sig"))
    // band split: two 8-bit bands; candidates share at least one band
    // bucket (classic LSH OR-amplification — higher recall than one
    // 16-bit bucket, still avoids the full cross join)
    val banded = sig
      .withColumn("band1", expr("sig % 256"))
      .withColumn("band2", expr("sig div 256"))
    val q = banded.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
        col("band1").as("qb1"), col("band2").as("qb2"))
    val cand = banded.select(col("vec_id").as("n_id"), col("v").as("nv"), col("nrm").as("nn"),
      col("band1"), col("band2"))
    // bucket join on either band (the ANN candidate generation step)
    val pairs = cand.join(broadcast(q),
        (col("qb1") === col("band1") || col("qb2") === col("band2")) && col("q_id") =!= col("n_id"))
      .withColumn("sim",
        graft.ops.Registry.rnd(ndot(col("qv"), col("nv")) / (col("qn") * col("nn")), 4))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("rank"), col("n_id"), col("sim"))
      .orderBy(col("q_id"), col("rank"))
  }
}
