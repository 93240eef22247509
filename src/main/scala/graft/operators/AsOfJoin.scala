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

  /** Backward as-of join through the NATIVE Catalyst operator
    * ([[graft.plans.AsOfJoinNode]] → `AsOfJoinExec`): attaches the ENTIRE
    * matched right row (nulls when no match), which the union-and-sweep
    * plan above cannot do without one running window per payload column.
    * Each side shuffles once on its own key and the merge is a single
    * streaming pass per partition with one buffered row.
    *
    * Column names must be disjoint across sides (rename the right
    * payload first — it is the attached side). Equal-time right rows
    * resolve by `tieBreak` columns (ascending; the LAST wins), so the
    * match is deterministic under any partitioning.
    */
  def nativeBackward(left: DataFrame, right: DataFrame,
      leftKey: String, leftTs: String, rightKey: String, rightTs: String,
      tolerance: Long = Long.MaxValue,
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "native as-of join requires disjoint column names; alias the right side")
    val spark = left.sparkSession
    import org.apache.spark.sql.graftbridge.SqlBridge
    // fresh exprIds on the right: a self-join of one source would
    // otherwise carry duplicate ids into the node's output
    val r = right.select(right.columns.map(c => col(c).as(c)): _*)
    val lPlan = SqlBridge.analyzedPlan(left)
    val rPlan = SqlBridge.analyzedPlan(r)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(sys.error(s"no column $n"))
    SqlBridge.ofRows(spark, graft.plans.AsOfJoinNode(
      lPlan, rPlan,
      attr(lPlan, leftKey), attr(lPlan, leftTs),
      attr(rPlan, rightKey), attr(rPlan, rightTs),
      tieBreak.map(attr(rPlan, _)), tolerance))
  }
}
