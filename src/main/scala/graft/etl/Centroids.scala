package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The centroid stage of the reference ETL (SURVEY §7.1 step 4).
  *
  * A1 — grouped weighted mean with zero-weight fallback
  * (/root/reference/data/src/utils/census.py:9-47): for each group,
  * Σ(v·w)/Σw when Σw > 0, else plain mean(v). Expressed with three
  * built-in aggregates + `when`, so it stays inside whole-stage codegen
  * and map-side partial aggregation — no UDAF, one shuffle.
  */
object Centroids {

  /** weighted-mean-with-fallback as a composition of three built-in
    * aggregates (kept as the reference formulation; equivalent to the
    * single-buffer [[graft.plans.WeightedMeanAgg]]).
    */
  def weightedMean(v: Column, w: Column): Column =
    when(sum(w) === 0.0, avg(v))
      .otherwise(sum(v * w) / sum(w))

  /** cenloc-style build (create_cenloc.py:17-27): per-geoid unweighted and
    * population-weighted centroids of block coordinates, in one aggregate
    * pass over the blocks. Uses the declarative custom aggregate — this
    * puts [[graft.plans.WeightedMeanAgg]] on the oracle-verified path
    * (q29/q33).
    */
  def cenloc(blockloc: DataFrame): DataFrame = {
    val w = col("population").cast("double")
    blockloc
      .groupBy(col("geoid"))
      .agg(
        avg(col("x")).as("x"),
        avg(col("y")).as("y"),
        graft.plans.WeightedMeanAgg.weightedMean(col("x"), w).as("x_wt"),
        graft.plans.WeightedMeanAgg.weightedMean(col("y"), w).as("y_wt"),
        sum(col("population").cast("long")).as("population"))
  }
}
