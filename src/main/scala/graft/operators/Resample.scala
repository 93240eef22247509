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
  * user's first and last event) are unioned with the events and two
  * user-partitioned RUNNING-frame window passes compute, for every grid
  * point, the previous/next observation via IGNORE NULLS last() — grid
  * rows carry null values, so they are transparent to the scan. The
  * next-observation pass runs over the DESCENDING timeline with an
  * unboundedPreceding→currentRow frame, which Spark evaluates
  * incrementally in O(k); the naive ascending currentRow→
  * unboundedFollowing frame recomputes per row (O(k²) per user — the
  * round-5 suite's single scale-killer). One shuffle on user_id, two
  * sorts; the per-user partition is the user's own timeline (grid size
  * bounded by the observation span), never the whole table.
  *
  * Grid fan-out is chunked two-level (days, then hours within a day) so
  * a single sparse user spanning years never materializes one
  * span-length sequence() array in a single row.
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
      .select(col("user_id"), col("hlo"), col("hhi"),
        explode(expr("sequence(hlo div 24, hhi div 24)")).as("day"))
      .select(col("user_id"),
        explode(expr("transform(sequence(greatest(day * 24, hlo), " +
          s"least(day * 24 + 23, hhi)), h -> h * $HourUs)")).as("us"))

    val u = e.select(col("user_id"), col("us"), lit(0).as("pos"),
        col("event_id").as("ord"), col("v"))
      .unionByName(grid.select(col("user_id"), col("us"), lit(1).as("pos"),
        lit(0L).as("ord"), lit(null).cast("double").as("v")))

    // Both frames are unboundedPreceding→currentRow in their own sort
    // order, which Spark's window exec evaluates incrementally (O(k));
    // the descending pass over (us, pos, ord) makes last(_, ignoreNulls)
    // the first non-null AT-OR-AFTER the row in ascending order — the
    // exact frame first(_, ignoreNulls) over currentRow→
    // unboundedFollowing would scan, without its per-row recompute.
    val before = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("pos"), col("ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val afterRun = Window.partitionBy(col("user_id"))
      .orderBy(col("us").desc, col("pos").desc, col("ord").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val obsUs = when(col("pos") === 0, col("us"))

    u.withColumn("pv", last(col("v"), ignoreNulls = true).over(before))
      .withColumn("pts", last(obsUs, ignoreNulls = true).over(before))
      .withColumn("nv", last(col("v"), ignoreNulls = true).over(afterRun))
      .withColumn("nts", last(obsUs, ignoreNulls = true).over(afterRun))
      .filter(col("pos") === 1)
      .select(col("user_id"), col("us").as("grid_us"),
        when(col("nts").isNull, col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            ((col("us") - col("pts")).cast("double") /
             (col("nts") - col("pts")).cast("double"))).as("value"))
  }
}
