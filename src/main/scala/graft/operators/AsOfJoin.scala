package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the most recent right
  * row with the same key whose timestamp is ≤ the left timestamp (and
  * within `tolerance`).
  *
  * Spark has no as-of join operator; the naive formulation is a range
  * join (quadratic blowup). This implementation is the scalable
  * union-and-sweep plan: tag both sides, union, sort per key by time, and
  * carry the last right timestamp forward with a running `last(ignoreNulls)`
  * window — ONE shuffle on the key, linear work, no range join, no
  * broadcast requirement on either side. This is preference-order (a) of
  * the build rules: composed built-ins express the semantics exactly, so
  * no custom SparkPlan is warranted.
  *
  * Used here for funnel/retention analytics over the events table
  * (signup → purchase attribution).
  */
object AsOfJoin {

  /** @param left      probe rows (e.g. purchases)
    * @param right     reference rows (e.g. signups)
    * @param key       join key column name (both sides)
    * @param ts        event-time column name (both sides, long)
    * @param tolerance max allowed (leftTs - rightTs); Long.MaxValue = none
    * @return left rows + `asof_ts` (matched right timestamp, null if none)
    */
  def backward(left: DataFrame, right: DataFrame, key: String, ts: String,
      tolerance: Long = Long.MaxValue): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("_side", lit(1))
    val r = right.select(col(key), col(ts)).withColumn("_side", lit(0))
    val unioned = l.columns.foldLeft(r) { (acc, c) =>
      if (acc.columns.contains(c)) acc else acc.withColumn(c, lit(null))
    }.select(l.columns.map(col): _*).unionByName(l)

    // right rows sort before left rows at equal timestamps (_side 0 < 1),
    // so a right row at exactly the left ts matches (≤ semantics)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val swept = unioned.withColumn("asof_ts",
      last(when(col("_side") === 0, col(ts)), ignoreNulls = true).over(w))

    swept.filter(col("_side") === 1)
      .withColumn("asof_ts",
        when(col(ts) - col("asof_ts") <= tolerance, col("asof_ts")))
      .select((leftCols.map(col) :+ col("asof_ts")): _*)
  }
}
