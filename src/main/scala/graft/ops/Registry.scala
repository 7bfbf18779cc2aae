package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One harness query: the Spark implementation plus (when the operator is
  * SQL-expressible) the DuckDB oracle twin. Column names are aligned
  * between the two by construction — the driver's compare hashes values
  * under sorted column names (builder prompt).
  */
final case class NamedQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

object Registry {

  /** Cross-engine-deterministic float aggregation: route double sums
    * through DECIMAL(18,4) so summation order cannot change the result,
    * then round and return to double (FIXTURES.md oracle caveats). The
    * oracle twins do the identical cast chain. */
  def dec(c: Column): Column = c.cast("decimal(18,4)")
  def sumDec2(c: Column): Column = round(sum(dec(c)), 2).cast("double")
  def avgDec2(c: Column): Column = round(avg(dec(c)), 2).cast("double")

  /** Deterministic rounding of an arbitrary double expression: Spark's
    * `round(double)` rounds the shortest decimal repr HALF_UP while
    * DuckDB rounds the binary value — casting to DECIMAL(18,8) first
    * makes both engines round the same decimal. Oracle twin:
    * `CAST(round(CAST(x AS DECIMAL(18,8)), s) AS DOUBLE)`. */
  def rnd(c: Column, scale: Int): Column =
    round(c.cast("decimal(18,8)"), scale).cast("double")

  def all: Vector[NamedQuery] =
    Relational.queries ++ MoreRelational.queries ++ TpchDeep.queries ++
      CdcQueries.queries ++ Layout.queries ++
      graft.llm.DedupQueries.queries ++ graft.llm.SimilarityQueries.queries ++
      graft.llm.TextQueries.queries ++ graft.llm.MultimodalQueries.queries ++
      graft.llm.PipelineQueries.queries ++ graft.llm.CurationQueries.queries ++
      graft.llm.SamplingQueries.queries ++ graft.llm.ForensicsQueries.queries ++
      SeriesQueries.queries ++ MonitorQueries.queries ++ StatsQueries.queries
}
