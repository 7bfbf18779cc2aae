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
  * maximizes it given assignments — up to the 4-dp assignment
  * rounding, whose HALF_UP half-ulp on each side of a near-tie bounds
  * any legitimate dip at 1e-4 per vector. KMeansSpec pins that
  * property on real data.
  */
object KMeans {

  /** Returns (final codebook (cid, cv, cn), per-round objective).
    *
    * Driver-memory bound: each round materializes the k-row codebook on
    * the driver (localCheckpoint) and callers collect k×dim doubles —
    * ~8·k·dim bytes. With the √N sizing rule (CodebookStore.kFor,
    * capped) and dim=64 this is kilobytes; an uncapped |C| ≈ √N at
    * N=10⁹ (~31k cells, ~16 MB at dim=64) still fits a driver
    * comfortably, but that is the figure to re-check before raising the
    * cap — the codebook is the ONLY training state that ever leaves the
    * executors.
    *
    * Seeds are the first k vectors in vec_id ORDER (no contiguity
    * assumption); a cluster that loses every member keeps its previous
    * centroid, so the codebook never silently shrinks below k. The
    * corpus and each round's assignment persist once and are
    * unpersisted when superseded — only the (k-row) codebook
    * checkpoints, which truncate the iterative lineage, outlive the
    * call. Centroid means route through DECIMAL like the
    * oracle-checked single step, so identical inputs give identical
    * codebooks regardless of partition order. */
  /** @param computeObjective false skips the per-round objective job
    *   (one broadcast join + aggregate per round) and returns an empty
    *   objective list — the index-build path wants only the codebook */
  def train(
      spark: SparkSession, dir: String,
      k: Int = 8, rounds: Int = 3,
      computeObjective: Boolean = true,
  ): (DataFrame, Seq[Double]) = {
    val e = Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("nrm", sqrt(ndot(col("v"), col("v"))))
      .persist() // read the corpus once across all rounds
    var cb = e.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
      .localCheckpoint()
    val objectives = Vector.newBuilder[Double]
    (1 to rounds).foreach { _ =>
      val cbArr = cb.agg(collect_list(struct(col("cid"), col("cv"), col("cn"))).as("cb"))
      val assigned = e.crossJoin(broadcast(cbArr))
        .withColumn("cid",
          graft.expressions.CellFunctions.nearestCell(col("v"), col("nrm"), col("cb")))
        .select(col("cid"), col("v"), col("nrm"))
        .persist() // one assignment compute serves objective AND update
      if (computeObjective) {
        val objRow = assigned.join(broadcast(cb), "cid")
          .select((ndot(col("v"), col("cv")) / (col("nrm") * col("cn"))).as("sim"))
          .agg(sum(col("sim"))).head()
        objectives += (if (objRow.isNullAt(0)) 0.0 else objRow.getDouble(0))
      }
      val rebuilt = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "val")))
        .groupBy(col("cid"), col("pos"))
        // DECIMAL summation: order-independent means (Registry.dec rule)
        .agg(graft.ops.Registry.rnd(avg(graft.ops.Registry.dec(col("val"))), 4).as("c"))
        .groupBy(col("cid"))
        .agg(expr("transform(sort_array(collect_list(struct(pos, c))), s -> s.c)").as("cv"))
        .withColumn("cn", sqrt(ndot(col("cv"), col("cv"))))
      // a cluster that lost all members keeps its previous centroid
      val kept = cb.join(rebuilt.select(col("cid")), Seq("cid"), "left_anti")
      val next = rebuilt.unionByName(kept).localCheckpoint()
      assigned.unpersist()
      cb = next
    }
    e.unpersist()
    (cb, objectives.result())
  }
}
