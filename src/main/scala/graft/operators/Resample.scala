package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample each user's irregular event
  * stream onto an hourly grid with linear interpolation between the
  * surrounding observations — the gap-filling step before any
  * fixed-step sequence model sees sensor/telemetry data.
  *
  * Shape: NO join. The grid rows (one per user per hour between that
  * user's first and last event) are unioned with the events and a single
  * user-partitioned window pass computes, for every grid point, the
  * previous/next observation via IGNORE NULLS last/first — grid rows
  * carry null values, so they are transparent to the scan. One shuffle
  * on user_id; the per-user partition is the user's own timeline (grid
  * size bounded by the observation span), never the whole table.
  *
  * Determinism: grid timestamps are exact integer hours (µs); the
  * interpolation `pv + (nv − pv) · ((t − pts) / (nts − pts))` is written
  * with identical association and explicit double casts in the DuckDB
  * oracle, so IEEE gives bit-equal results. A grid point landing exactly
  * on an observation interpolates with fraction 0 → the observed value.
  */
object Resample {
  private val HourUs = 3600L * 1000000L

  /** (user_id, grid_us, value) — hourly grid clipped to each user's span. */
  def hourlyInterpolate(events: DataFrame): DataFrame = {
    val e = events.select(
      col("user_id"), col("event_id"),
      expr("ts div 1000").as("us"),
      col("value").cast("double").as("v"))

    val grid = e.groupBy(col("user_id"))
      .agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
      .select(col("user_id"),
        expr(s"(lo + ${HourUs - 1}) div $HourUs").as("hlo"),
        expr(s"hi div $HourUs").as("hhi"))
      .filter(col("hlo") <= col("hhi"))
      .select(col("user_id"),
        explode(expr(s"transform(sequence(hlo, hhi), h -> h * $HourUs)")).as("us"))

    val u = e.select(col("user_id"), col("us"), lit(0).as("pos"),
        col("event_id").as("ord"), col("v"))
      .unionByName(grid.select(col("user_id"), col("us"), lit(1).as("pos"),
        lit(0L).as("ord"), lit(null).cast("double").as("v")))

    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("pos"), col("ord"))
    val before = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val after = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsUs = when(col("pos") === 0, col("us"))

    u.withColumn("pv", last(col("v"), ignoreNulls = true).over(before))
      .withColumn("pts", last(obsUs, ignoreNulls = true).over(before))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(after))
      .withColumn("nts", first(obsUs, ignoreNulls = true).over(after))
      .filter(col("pos") === 1)
      .select(col("user_id"), col("us").as("grid_us"),
        when(col("nts").isNull, col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            ((col("us") - col("pts")).cast("double") /
             (col("nts") - col("pts")).cast("double"))).as("value"))
  }
}
