package graft

import graft.operators.Resample
import org.scalatest.funsuite.AnyFunSuite

class ResampleSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val Hour = 3600L * 1000000L

  /** (user, nanos ts, value) rows → DataFrame shaped like events. */
  private def ev(rows: (Long, Long, Double)*) =
    rows.zipWithIndex
      .map { case ((u, tsUs, v), i) => (i.toLong, tsUs * 1000L, u, "x", v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")

  test("grid points interpolate linearly between surrounding observations") {
    // user 1: value 0.0 at t=30min, 100.0 at t=90min → grid hour 1 is
    // exactly halfway: 50.0
    val df = ev((1L, 1800L * 1000000L, 0.0), (1L, 5400L * 1000000L, 100.0))
    val got = Resample.hourlyInterpolate(df)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, Hour, 50.0)))
  }

  test("a grid point landing exactly on an observation returns that value") {
    val df = ev(
      (1L, Hour, 42.0),          // exactly on the hour
      (1L, Hour + 1800L * 1000000L, 99.0),
      (1L, 2 * Hour, 7.0))       // exactly on the next hour
    val got = Resample.hourlyInterpolate(df)
      .as[(Long, Long, Double)].collect().sortBy(_._2).toSeq
    assert(got == Seq((1L, Hour, 42.0), (1L, 2 * Hour, 7.0)))
  }

  test("users with a sub-hour span produce no grid rows; spans clip per user") {
    val df = ev(
      (1L, 100L, 1.0), (1L, 200L, 2.0),               // tiny span, no hour inside
      (2L, Hour - 1, 10.0), (2L, Hour + 1, 20.0))     // one hour point inside
    val got = Resample.hourlyInterpolate(df)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) == Seq((2L, Hour)))
    assert(math.abs(got.head._3 - 15.0) < 1e-9) // midpoint of 10..20 (±1µs)
  }

  test("plans one user-partitioned window pass and no join") {
    val plan = Resample.hourlyInterpolate(ev((1L, Hour, 1.0)))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"resample must be join-free:\n$plan")
  }

  // Round-5 scale-killer regression guard: the next-observation pass must
  // be a running frame (incremental O(k)), never an UnboundedFollowing
  // frame (Spark recomputes that frame per row → O(k²) per user).
  test("no UnboundedFollowing window frame in the plan") {
    val plan = Resample.hourlyInterpolate(ev((1L, Hour, 1.0)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UNBOUNDED FOLLOWING"),
      s"quadratic window frame reintroduced:\n$plan")
  }

  test("skew: one user with a 100x span (2 sparse events, ~2 years apart)") {
    val span = 17520L // hours ≈ 2 years
    val df = ev(
      (1L, Hour, 0.0), (1L, (span + 1) * Hour, span.toDouble * 2),
      (2L, Hour, 5.0), (2L, 2 * Hour, 7.0)) // a normal user beside the whale
    val got = Resample.hourlyInterpolate(df).cache()
    try {
      val whale = got.filter($"user_id" === 1L)
        .as[(Long, Long, Double)].collect().sortBy(_._2)
      assert(whale.length == span + 1) // hours 1..span+1 inclusive
      // linear ramp: value at grid hour h is (h-1)*2
      val mid = whale(8000)
      assert(math.abs(mid._3 - 8000L * 2) < 1e-6)
      assert(got.filter($"user_id" === 2L).count() == 2)
    } finally got.unpersist()
  }
}
