package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Tables
import graft.expressions.VectorFunctions.{dot => ndot}

/** Spherical k-means training loop — `sim_kmeans_update` iterated to a
  * trained codebook, the missing step between the harness's single
  * Lloyd iteration and the IVF index that consumes the centroids.
  *
  * Per round: cosine assignment via the native zero-exchange
  * `NearestCell` argmax against the broadcast codebook, then mean
  * centroids rebuilt through a map-side-combined posexplode
  * aggregation (the shuffle carries partitions × k × dim partial sums
  * — identical dataflow to the oracle-checked single step). Each
  * round's k-row codebook is localCheckpointed so round N+1's plan
  * does not re-run rounds 1..N (the same lineage-truncation discipline
  * as `dedup_cluster_canonical`'s label-propagation rounds).
  *
  * The returned per-round objective (sum of each vector's cosine to
  * its centroid) is non-decreasing by the standard spherical-k-means
  * argument: assignment maximizes it given centroids, the mean update
  * maximizes it given assignments (up to the 4-dp assignment rounding,
  * which bounds any dip at 5e-5 per vector). KMeansSpec pins that
  * property on real data.
  */
object KMeans {

  /** Returns (final codebook (cid, cv, cn), per-round objective). */
  def train(
      spark: SparkSession, dir: String,
      k: Int = 8, rounds: Int = 3,
  ): (DataFrame, Seq[Double]) = {
    val e = Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("nrm", sqrt(ndot(col("v"), col("v"))))
      .localCheckpoint() // read the corpus once across all rounds
    var cb = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
      .localCheckpoint()
    val objectives = Vector.newBuilder[Double]
    (1 to rounds).foreach { _ =>
      val cbArr = cb.agg(collect_list(struct(col("cid"), col("cv"), col("cn"))).as("cb"))
      val assigned = e.crossJoin(broadcast(cbArr))
        .withColumn("cid",
          graft.expressions.CellFunctions.nearestCell(col("v"), col("nrm"), col("cb")))
        .select(col("cid"), col("v"), col("nrm"))
      objectives += assigned.join(broadcast(cb), "cid")
        .select((ndot(col("v"), col("cv")) / (col("nrm") * col("cn"))).as("sim"))
        .agg(sum(col("sim"))).head().getDouble(0)
      cb = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "val")))
        .groupBy(col("cid"), col("pos")).agg(avg(col("val")).as("c"))
        .groupBy(col("cid"))
        .agg(expr("transform(sort_array(collect_list(struct(pos, c))), s -> s.c)").as("cv"))
        .withColumn("cn", sqrt(ndot(col("cv"), col("cv"))))
        .localCheckpoint()
    }
    (cb, objectives.result())
  }
}
