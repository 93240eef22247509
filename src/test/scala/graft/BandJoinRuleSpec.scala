package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The band-join optimizer rule: an inequality-only join must come out of
  * the planner as a bucket equi-join, with results identical to the naive
  * cross product + filter.
  */
class BandJoinRuleSpec extends AnyFunSuite {
  import SparkTestSession._

  test("abs(x-y) <= c join plans as a bucket equi-join, same result set") {
    val s = spark
    import s.implicits._
    val a = (0 until 400).map(i => (i.toLong, i * 0.25)).toDF("ida", "xa")
    val b = (0 until 300).map(j => (j.toLong, 10.0 + j * 0.4)).toDF("idb", "xb")

    val joined = a.crossJoin(b).filter(abs($"xa" - $"xb") <= 1.5)
      .select($"ida", $"idb")
    val rows = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // ground truth by driver-side loop
    val want = (for {
      i <- 0 until 400
      j <- 0 until 300
      if math.abs(i * 0.25 - (10.0 + j * 0.4)) <= 1.5
    } yield (i.toLong, j.toLong)).toSet
    assert(rows == want, s"${rows.size} vs ${want.size}")
    assert(want.nonEmpty)

    val planStr = joined.queryExecution.executedPlan.toString
    assert(planStr.contains("_graft_bkt"), "band-join rule did not fire:\n" + planStr.take(1200))
    assert(!planStr.contains("BroadcastNestedLoopJoin") && !planStr.contains("CartesianProduct"),
      "inequality join still a nested loop:\n" + planStr.take(1200))
  }

  test("joins that already have equi keys are left alone") {
    val s = spark
    import s.implicits._
    val a = (0 until 50).map(i => (i.toLong, i * 1.0)).toDF("k", "xa")
    val b = (0 until 50).map(i => (i.toLong, i * 1.0 + 0.25)).toDF("k", "xb")
    val joined = a.join(b, "k").filter(abs($"xa" - $"xb") <= 0.5)
    assert(joined.count() == 50)
    val planStr = joined.queryExecution.executedPlan.toString
    assert(!planStr.contains("_graft_bkt"), "rule fired on an equi join")
  }
}
