package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins: salt the skewed (big) side's key into
  * `saltFactor` sub-keys and replicate the small side once per salt, so
  * a hot key's rows spread over `saltFactor` tasks instead of one.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on
  * by default) covers sort-merge joins automatically; explicit salting
  * remains the tool when the skewed aggregation/join shape AQE can't
  * split (e.g. a skewed groupBy, or deterministic layout control at
  * 100 TB). The salt is derived from stable row content (hash of all
  * columns), keeping the operator deterministic.
  */
object Salting {

  /** Equi-join `big` with `small` on `key`, salting the big side. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, saltFactor: Int): DataFrame = {
    val bigSalted = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val salts = small.sparkSession.range(saltFactor.toLong)
      .select(col("id").cast("int").as("__salt"))
    val smallReplicated = small.crossJoin(salts)
    bigSalted.join(smallReplicated,
        bigSalted(key) === smallReplicated(key) && bigSalted("__salt") === smallReplicated("__salt"))
      .drop(smallReplicated(key))
      .drop("__salt")
  }

  /** Skewed two-level aggregation: partial aggregate on (key, salt),
    * then final aggregate on key — the map-side-combine trick made
    * explicit for skewed keys. `agg` must be an algebraic pair, e.g.
    * (sum, sum) or (count, sum).
    *
    * The salt must spread a hot key's rows regardless of their content
    * (a skewed key whose aggregated value is constant is the classic
    * case), so it is taken from row position — `monotonically_increasing_id`
    * is unique per row and deterministic for a fixed input partitioning —
    * never from the aggregated value. */
  def saltedSum(df: DataFrame, key: String, valueCol: String, saltFactor: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
    salted.groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }
}
