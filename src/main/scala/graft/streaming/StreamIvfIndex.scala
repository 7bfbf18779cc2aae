package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.expressions.{CellFunctions, VectorFunctions}
import graft.llm.CodebookStore.Codebook

/** Streaming ANN-index maintenance — the operational counterpart of the
  * offline IVF build (KMeans.train → CodebookStore). A 100 TB corpus
  * doesn't retrain its index per arriving batch; it ASSIGNS new
  * embeddings against the persisted codebook (a zero-exchange literal
  * projection, the same NearestCell path the queries use) and watches
  * two cheap per-cell statistics for drift:
  *
  *  - mean coverage similarity (how well the codebook still covers the
  *    incoming distribution — falls when the data shifts away from the
  *    trained centroids), and
  *  - cell-population skew (max/mean — rises when arrivals crowd into
  *    few cells, degrading probe cost).
  *
  * When either crosses its bound, [[assess]] recommends a retrain —
  * the trigger for re-running the offline build. State is O(|C|) rows
  * (the codebook cardinality, NOT the corpus), so it merges in
  * micro-seconds at any scale; per-batch cost is one scan of the batch
  * plus a |C|-group partial aggregation.
  */
object StreamIvfIndex {

  val statsSchema: StructType = StructType(Seq(
    StructField("cid", LongType),
    StructField("n", LongType),
    StructField("cov_sum", DoubleType),
  ))

  def emptyStats(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], statsSchema)

  /** Assign one micro-batch of embeddings (`vec_id`, `v: array<double>`)
    * against the codebook and merge per-cell (count, coverage-sum)
    * into `stats`. Coverage snaps to DECIMAL(18,8) per row so the
    * running sums are order-independent across merges. */
  def applyBatch(stats: DataFrame, batch: DataFrame, cb: Codebook): DataFrame = {
    // same |C|-threshold delivery auto-selection as the batch ANN
    // queries (round 10's literal-wall removal): below the threshold
    // the codebook is a plan literal; above it — the √N a 1e9-vector
    // index wants — it rides one broadcast relation per micro-batch
    // and the centroid lookup is a BroadcastHashJoin on cid
    val spark = batch.sparkSession
    val normed = batch
      .withColumn("nrm", sqrt(VectorFunctions.dot(col("v"), col("v"))))
    val (nb, cbCol) = graft.llm.SimilarityQueries.attachCodebook(spark, normed, cb)
    val assigned = nb.withColumn("cid",
      CellFunctions.nearestCell(col("v"), col("nrm"), cbCol))
    val withC =
      if (cb.size <= graft.llm.SimilarityQueries.broadcastThreshold) {
        val cbMap = typedLit(cb.map { case (cid, cv, cn) => cid -> ((cv, cn)) }.toMap)
        assigned.withColumn("c", element_at(cbMap, col("cid")))
          .withColumn("cov",
            (VectorFunctions.dot(col("v"), col("c._1")) / (col("nrm") * col("c._2")))
              .cast("decimal(18,8)"))
      } else {
        import spark.implicits._
        assigned.join(broadcast(cb.toDF("cid", "cv", "cn")), Seq("cid"))
          .withColumn("cov",
            (VectorFunctions.dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
              .cast("decimal(18,8)"))
      }
    val delta = withC
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n"), sum(col("cov")).cast("double").as("cov_sum"))
    stats.unionByName(delta)
      .groupBy(col("cid"))
      .agg(sum(col("n")).as("n"),
        sum(col("cov_sum").cast("decimal(28,8)")).cast("double").as("cov_sum"))
  }

  /** Index-health verdict from the accumulated stats. `minCov` is the
    * acceptance bar the offline build met at train time (the
    * sim_recall_eval gate's coverage analog); `maxSkew` bounds probe
    * cost (a probe scans the hit cell — a cell at s× the mean costs
    * s× the expected probe). */
  final case class Drift(meanCov: Double, skew: Double, retrain: Boolean)

  /** `k` is the codebook cardinality: skew is measured against the
    * uniform expectation n_total/k, so cells the stream never touches
    * count against balance (stats rows only exist for hit cells). */
  def assess(stats: DataFrame, k: Int,
      minCov: Double = 0.5, maxSkew: Double = 4.0): Drift = {
    val r = stats.agg(
      (sum(col("cov_sum")) / sum(col("n"))).as("mean_cov"),
      (max(col("n")) * lit(k.toLong)).cast("double").as("max_k"),
      sum(col("n")).cast("double").as("total")).head()
    if (r.isNullAt(0)) Drift(1.0, 1.0, retrain = false)
    else {
      val (meanCov, skew) = (r.getDouble(0), r.getDouble(1) / r.getDouble(2))
      Drift(meanCov, skew, retrain = meanCov < minCov || skew > maxSkew)
    }
  }
}
