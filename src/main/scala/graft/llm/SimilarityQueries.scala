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
    NamedQuery("sim_lsh_topk", lshTopK, Some(lshTopKSql)),
    NamedQuery("sim_ivf_topk", ivfTopK, Some(ivfTopKSql)),
    NamedQuery("sim_ivf_multiprobe", ivfMultiprobe, Some(ivfMultiprobeSql)),
    NamedQuery("sim_quantize_error", quantizeError, Some(quantizeErrorSql)),
    NamedQuery("sim_kmeans_update", kmeansUpdate, Some(kmeansUpdateSql)),
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
    // 16-bit signature: bit i = (v . plane_i) > 0, as the native
    // codegen'd SignBits expression over the literal plane set — the
    // interpreted aggregate/transform/zip_with formulation of the same
    // fold ran three nested lambda closures per row (r4 bench: ~0.3 s
    // of pure boxing on this query alone)
    val sig = e.withColumn("sig",
        graft.expressions.SignFunctions.signBits(col("v"), typedLit(planes(16, 64))))
      .select(col("vec_id"), col("v"), col("nrm"), col("sig"))
    // band split: two 8-bit bands, exploded to one row per (band,
    // bucket) so candidate generation is a plain EQUI-join on the
    // bucket key (classic LSH OR-amplification). An OR of the two band
    // predicates would force BroadcastNestedLoopJoin — every candidate
    // tested against every query, the full scan LSH exists to avoid.
    val banded = sig.select(col("vec_id"), col("v"), col("nrm"), explode(array(
        struct(lit(0).as("band"), expr("sig % 256").as("bucket")),
        struct(lit(1).as("band"), expr("sig div 256").as("bucket")))).as("bb"))
      .select(col("vec_id"), col("v"), col("nrm"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val q = banded.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
        col("band"), col("bucket"))
    val cand = banded.select(col("vec_id").as("n_id"), col("v").as("nv"), col("nrm").as("nn"),
      col("band"), col("bucket"))
    // hash equi-join on (band, bucket); a pair sharing both bands
    // matches twice, so dedup the (small) candidate set before ranking
    val pairs = cand.join(broadcast(q), Seq("band", "bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .dropDuplicates("q_id", "n_id")
      .withColumn("sim",
        graft.ops.Registry.rnd(ndot(col("qv"), col("nv")) / (col("qn") * col("nn")), 4))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("rank"), col("n_id"), col("sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** DuckDB twin of [[lshTopK]]: the seed-deterministic hyperplanes are
    * inlined as array literals (shortest-roundtrip double reprs parse to
    * identical bits), so the oracle reproduces signatures, buckets and
    * ranking exactly. */
  private lazy val lshTopKSql: String = {
    val planeLits = planes(16, 64)
      .map(p => p.mkString("[", ", ", "]"))
    val sigExpr = planeLits.zipWithIndex
      .map { case (p, i) =>
        s"(CASE WHEN list_dot_product(v, $p) > 0 THEN ${1L << i} ELSE 0 END)"
      }
      .mkString(" + ")
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
       |  FROM embeddings
       |), sig AS (
       |  SELECT vec_id, v, nrm, CAST($sigExpr AS BIGINT) AS sig FROM e
       |), banded AS (
       |  SELECT vec_id, v, nrm, 0 AS band, sig % 256 AS bucket FROM sig
       |  UNION ALL
       |  SELECT vec_id, v, nrm, 1 AS band, sig // 256 AS bucket FROM sig
       |), pairs AS (
       |  SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS n_id
       |  FROM banded q JOIN banded c ON q.band = c.band AND q.bucket = c.bucket
       |  WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id
       |), sims AS (
       |  SELECT p.q_id, p.n_id,
       |    CAST(round(CAST(list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS DECIMAL(18,8)), 4) AS DOUBLE) AS sim
       |  FROM pairs p
       |  JOIN e a ON a.vec_id = p.q_id
       |  JOIN e b ON b.vec_id = p.n_id
       |), ranked AS (
       |  SELECT q_id, n_id, sim,
       |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
       |  FROM sims
       |)
       |SELECT q_id, rank, n_id, sim FROM ranked WHERE rank <= 3
       |ORDER BY q_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------
  // Trained-codebook cache: one spherical k-means train per data dir
  // per JVM — the offline index build a real deployment runs once and
  // amortizes across every query (and every bench pass). The oracle-SQL
  // builders below read the SAME cache: Verify evaluates `oracleSql`
  // AFTER running the queries, so the DuckDB twin inlines the exact
  // centroid literals the Spark plan used (the LSH-planes pattern,
  // except the literals are data-derived instead of seed-derived).
  private val trained =
    new java.util.concurrent.ConcurrentHashMap[String, Vector[(Long, Vector[Double], Double)]]()
  @volatile private var lastTrainedDir: Option[String] = None

  /** Test hook: drop the in-JVM cache so a "restarted session" can be
    * simulated — the reload must come from [[CodebookStore]]'s file. */
  private[llm] def resetCodebookCacheForTest(): Unit = {
    trained.clear(); lastTrainedDir = None
  }

  private def trainedCodebook(
      spark: SparkSession, dir: String): Vector[(Long, Vector[Double], Double)] = {
    // memory cache → persisted index file → train-once (√N-sized k);
    // see CodebookStore for the restart/scale rationale
    val cb = trained.computeIfAbsent(dir, d => CodebookStore.loadOrTrain(spark, d))
    lastTrainedDir = Some(dir)
    cb
  }

  /** The trained codebook as a DuckDB VALUES relation `(cid, cv, cn)`.
    * Centroid components are 4-dp decimals (exact in both engines); the
    * norm roundtrips through the shortest double repr like the LSH
    * plane literals. Falls back to the deterministic first-64-seed
    * codebook WITHOUT training if no training ran in this JVM — that
    * only happens when the IVF queries themselves never ran, i.e. there
    * is no Spark dump to compare the SQL against anyway. */
  private def codebookSql: String = {
    val cb = lastTrainedDir.flatMap(d => Option(trained.get(d)))
    cb match {
      case Some(c) =>
        val rows = c.map { case (cid, cv, cn) =>
          s"(CAST($cid AS BIGINT), CAST(${cv.mkString("[", ", ", "]")} AS DOUBLE[]), CAST($cn AS DOUBLE))"
        }.mkString(",\n    ")
        s"SELECT * FROM (VALUES\n    $rows\n  ) t(cid, cv, cn)"
      case None =>
        """SELECT vec_id AS cid, v AS cv, nrm AS cn FROM e
          |  WHERE vec_id IN (SELECT vec_id FROM e ORDER BY vec_id LIMIT 64)""".stripMargin
    }
  }

  // ---------------------------------------------------------------
  // IVF-style ANN over a TRAINED codebook: `KMeans.train` (spherical
  // k-means, deterministic first-k seeds, k capped at 64 — |C| must be
  // FIXED, not grow with the corpus, or the N x |C| assignment turns
  // super-linear: uncapped, the 10x sweep measured 20x) runs ONCE per
  // JVM per data dir — the offline index build a real deployment
  // amortizes across every query — and its centroids enter the plan as
  // a LITERAL codebook (the LSH-planes pattern, except data-derived).
  // Each vector is assigned to its nearest centroid by (rounded)
  // cosine, then queries probe ONLY their own cell (nProbe=1) and
  // exact-rank within it. This is the inverted-file scale path: at
  // 100 TB the assignment is one literal-codebook projection (no join
  // at all) and search touches 1/|C| of the corpus per probe; recall
  // is tuned by nProbe without changing the dataflow shape.
  // Assignment/ranking compare 4-dp-rounded sims with centroid-id /
  // neighbor-id tiebreaks, so both engines pick identical cells.
  private def ivfTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("nrm", sqrt(ndot(col("v"), col("v"))))
    // assignment is a pure PROJECTION: each vector takes its own argmax
    // against the literal trained codebook via the native NearestCell
    // expression — no window, no exchange, no interpreted lambda, not
    // even a broadcast join. A row_number over
    // Window.partitionBy(vec_id) here would shuffle+sort the whole
    // corpus just to pick a per-row max against constant data.
    val cbLit = typedLit(trainedCodebook(spark, dir))
    val assign = e
      .withColumn("cid",
        graft.expressions.CellFunctions.nearestCell(col("v"), col("nrm"), cbLit))
      .select(col("vec_id"), col("cid"), col("v"), col("nrm"))
    val q = assign.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("cid").as("qcid"), col("v").as("qv"), col("nrm").as("qn"))
    val pairs = assign.select(col("vec_id").as("n_id"), col("cid"), col("v").as("nv"), col("nrm").as("nn"))
      .join(broadcast(q), col("qcid") === col("cid") && col("q_id") =!= col("n_id"))
      .withColumn("sim", graft.ops.Registry.rnd(ndot(col("qv"), col("nv")) / (col("qn") * col("nn")), 4))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("rank"), col("n_id"), col("sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  // Multi-probe IVF — the standard recall knob (nProbe=2): queries
  // search their TWO nearest cells instead of one, catching neighbors
  // that fell just across a Voronoi boundary. The probe list comes from
  // the native NearestCells expression — still a projection against the
  // literal trained codebook (no window, no exchange); per-query cost
  // scales linearly in nProbe while the corpus-side assignment is
  // unchanged. Recall-vs-nProbe on sf0.1 is recorded in BASELINE.md.
  private def ivfMultiprobe(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("nrm", sqrt(ndot(col("v"), col("v"))))
    val cbLit = typedLit(trainedCodebook(spark, dir))
    val assign = e
      .withColumn("cid",
        graft.expressions.CellFunctions.nearestCell(col("v"), col("nrm"), cbLit))
      .select(col("vec_id"), col("cid"), col("v"), col("nrm"))
    val q = e.filter(col("vec_id") < 8)
      .withColumn("probe", explode(
        graft.expressions.CellFunctions.nearestCells(col("v"), col("nrm"), cbLit, 2)))
      .select(col("vec_id").as("q_id"), col("probe"), col("v").as("qv"), col("nrm").as("qn"))
    val pairs = assign.select(col("vec_id").as("n_id"), col("cid"), col("v").as("nv"), col("nrm").as("nn"))
      .join(broadcast(q), col("probe") === col("cid") && col("q_id") =!= col("n_id"))
      .withColumn("sim", graft.ops.Registry.rnd(ndot(col("qv"), col("nv")) / (col("qn") * col("nn")), 4))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("rank"), col("n_id"), col("sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  private def ivfMultiprobeSql =
    s"""WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v,
      |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      |  FROM embeddings
      |), c AS (
      |  $codebookSql
      |), assign AS (
      |  SELECT vec_id, cid, v, nrm FROM (
      |    SELECT e.vec_id, c.cid, e.v, e.nrm,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        CAST(round(CAST(list_dot_product(e.v, c.cv) / (e.nrm * c.cn) AS DECIMAL(18,8)), 4) AS DOUBLE) DESC,
      |        c.cid) AS rn
      |    FROM e CROSS JOIN c
      |  ) WHERE rn = 1
      |), probes AS (
      |  SELECT vec_id AS q_id, cid AS probe, v AS qv, nrm AS qn FROM (
      |    SELECT e.vec_id, c.cid, e.v, e.nrm,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        CAST(round(CAST(list_dot_product(e.v, c.cv) / (e.nrm * c.cn) AS DECIMAL(18,8)), 4) AS DOUBLE) DESC,
      |        c.cid) AS rn
      |    FROM e CROSS JOIN c WHERE e.vec_id < 8
      |  ) WHERE rn <= 2
      |), pairs AS (
      |  SELECT p.q_id, a.vec_id AS n_id,
      |    CAST(round(CAST(list_dot_product(p.qv, a.v) / (p.qn * a.nrm) AS DECIMAL(18,8)), 4) AS DOUBLE) AS sim
      |  FROM assign a JOIN probes p ON a.cid = p.probe AND p.q_id <> a.vec_id
      |), ranked AS (
      |  SELECT q_id, n_id, sim,
      |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
      |  FROM pairs
      |)
      |SELECT q_id, rank, n_id, sim FROM ranked WHERE rank <= 3
      |ORDER BY q_id, rank""".stripMargin

  private def ivfTopKSql =
    s"""WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v,
      |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      |  FROM embeddings
      |), c AS (
      |  $codebookSql
      |), assign AS (
      |  SELECT vec_id, cid, v, nrm FROM (
      |    SELECT e.vec_id, c.cid, e.v, e.nrm,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        CAST(round(CAST(list_dot_product(e.v, c.cv) / (e.nrm * c.cn) AS DECIMAL(18,8)), 4) AS DOUBLE) DESC,
      |        c.cid) AS rn
      |    FROM e CROSS JOIN c
      |  ) WHERE rn = 1
      |), q AS (
      |  SELECT vec_id AS q_id, cid AS qcid, v AS qv, nrm AS qn
      |  FROM assign WHERE vec_id < 8
      |), pairs AS (
      |  SELECT q.q_id, a.vec_id AS n_id,
      |    CAST(round(CAST(list_dot_product(q.qv, a.v) / (q.qn * a.nrm) AS DECIMAL(18,8)), 4) AS DOUBLE) AS sim
      |  FROM assign a JOIN q ON a.cid = q.qcid AND q.q_id <> a.vec_id
      |), ranked AS (
      |  SELECT q_id, n_id, sim,
      |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
      |  FROM pairs
      |)
      |SELECT q_id, rank, n_id, sim FROM ranked WHERE rank <= 3
      |ORDER BY q_id, rank""".stripMargin

  // ---------------------------------------------------------------
  // Embedding quantization: per-vector min/max affine int8 (256-level)
  // codes, reporting the mean absolute reconstruction error — the
  // storage-compression pass a 100 TB embedding corpus runs before
  // indexing (4x smaller than float32, error bounded by (hi-lo)/510).
  // The quantized code is computed through a DECIMAL round so both
  // engines snap to identical levels.
  private def quantizeError(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("lo", array_min(col("v")))
      .withColumn("hi", array_max(col("v")))
      .withColumn("mean_abs_err", graft.ops.Registry.rnd(expr(
        """aggregate(v, 0D,
          |  (acc, x) -> acc + abs(x - (lo + cast(round(cast((x - lo) * 255.0 / (hi - lo) AS decimal(18,8)), 0) AS double) * (hi - lo) / 255.0)),
          |  acc -> acc / size(v))""".stripMargin), 6))
      .select(col("vec_id"), graft.ops.Registry.rnd(col("lo"), 6).as("lo"),
        graft.ops.Registry.rnd(col("hi"), 6).as("hi"), col("mean_abs_err"))
      .orderBy(col("vec_id"))

  private val quantizeErrorSql =
    """WITH mm AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v,
      |    list_min(embedding::DOUBLE[]) AS lo, list_max(embedding::DOUBLE[]) AS hi
      |  FROM embeddings
      |)
      |SELECT vec_id,
      |  CAST(round(CAST(lo AS DECIMAL(18,8)), 6) AS DOUBLE) AS lo,
      |  CAST(round(CAST(hi AS DECIMAL(18,8)), 6) AS DOUBLE) AS hi,
      |  CAST(round(CAST(list_sum(list_transform(v, x ->
      |    abs(x - (lo + CAST(round(CAST((x - lo) * 255.0 / (hi - lo) AS DECIMAL(18,8)), 0) AS DOUBLE) * (hi - lo) / 255.0)))) / len(v) AS DECIMAL(18,8)), 6) AS DOUBLE) AS mean_abs_err
      |FROM mm ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------
  // One Lloyd (k-means) iteration — the centroid-training step that
  // turns the IVF path's deterministic seed codebook into a real
  // index: assign every vector to its nearest of k=8 fixed seeds
  // (vec_id < 8), then recompute each centroid as the element-wise
  // member mean. Emitted in LONG form (cid, pos, c_val, n_members) so
  // every output cell is scalar — k*64 rows at ANY corpus size.
  //
  // Scale shape: assignment is the same zero-exchange native
  // NearestCell projection as sim_ivf_topk. The update posexplodes to
  // (cid, pos, val) — a 64x row fan-out, but hash aggregation combines
  // map-side, so the shuffle carries at most partitions x k x 64
  // partial sums, not the exploded corpus. Iterating to convergence
  // repeats this same dataflow with the previous round's centroids as
  // the codebook; one iteration is the representative (and oracle-able)
  // unit.
  private def kmeansUpdate(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("nrm", sqrt(ndot(col("v"), col("v"))))
    val c = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
    val cb = c.agg(collect_list(struct(col("cid"), col("cv"), col("cn"))).as("cb"))
    val assign = e.crossJoin(broadcast(cb))
      .withColumn("cid",
        graft.expressions.CellFunctions.nearestCell(col("v"), col("nrm"), col("cb")))
      .select(col("cid"), col("v"))
    assign
      .select(col("cid"), posexplode(col("v")).as(Seq("pos0", "val")))
      .groupBy(col("cid"), (col("pos0") + 1).cast("long").as("pos"))
      // avg over DECIMAL, not raw doubles: decimal summation is exact
      // and order-independent, so partition order can't flip c_val at a
      // 4th-decimal rounding boundary (the repo's cross-row aggregation
      // rule, Registry.dec)
      .agg(graft.ops.Registry.rnd(avg(graft.ops.Registry.dec(col("val"))), 4).as("c_val"),
        count(lit(1)).as("n_members"))
      .select(col("cid"), col("pos"), col("c_val"), col("n_members"))
      .orderBy(col("cid"), col("pos"))
  }

  private val kmeansUpdateSql =
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v,
      |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      |  FROM embeddings
      |), c AS (
      |  SELECT vec_id AS cid, v AS cv, nrm AS cn FROM e WHERE vec_id < 8
      |), assign AS (
      |  SELECT vec_id, cid, v FROM (
      |    SELECT e.vec_id, c.cid, e.v,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        CAST(round(CAST(list_dot_product(e.v, c.cv) / (e.nrm * c.cn) AS DECIMAL(18,8)), 4) AS DOUBLE) DESC,
      |        c.cid) AS rn
      |    FROM e CROSS JOIN c
      |  ) WHERE rn = 1
      |), exploded AS (
      |  SELECT cid, CAST(generate_subscripts(v, 1) AS BIGINT) AS pos, unnest(v) AS val
      |  FROM assign
      |)
      |SELECT cid, pos,
      |  CAST(round(CAST(avg(CAST(val AS DECIMAL(18,4))) AS DECIMAL(18,8)), 4) AS DOUBLE) AS c_val,
      |  count(*) AS n_members
      |FROM exploded
      |GROUP BY cid, pos
      |ORDER BY cid, pos""".stripMargin
}
