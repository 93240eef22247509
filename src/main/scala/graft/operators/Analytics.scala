package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics operators over the event stream — the funnel /
  * retention / sequence-pattern family every events warehouse grows.
  * All three reduce to user-keyed joins and aggregations: one shuffle
  * on user_id dominates, every later step works on strictly smaller
  * frames.
  */
object Analytics {

  /** Ordered k-step funnel: users whose step-i event occurs within
    * `windowUs` AFTER their step-(i−1) anchor (anchor = the EARLIEST
    * qualifying event, re-anchored per step — the standard "first
    * conversion" semantics). Emits one row per step: (step, event_type,
    * users).
    *
    * Shape: step i is `events ⋈ survivors` on user_id + a min-
    * aggregate; survivors shrink monotonically, so later joins are
    * broadcast-sized. No windows, no per-user sort.
    */
  def funnelCounts(
      events: DataFrame,
      steps: Seq[String],
      windowUs: Long): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val spark = events.sparkSession
    import spark.implicits._
    val e = events.select($"user_id", $"event_type", expr("ts div 1000").as("us"))
    var cur = e.filter($"event_type" === steps.head)
      .groupBy($"user_id").agg(min($"us").as("t"))
    var out = cur.agg(count(lit(1)).as("users"))
      .select(lit(1).as("step"), lit(steps.head).as("event_type"), $"users")
    steps.tail.zipWithIndex.foreach { case (st, i) =>
      val nxt = e.filter($"event_type" === st)
        .join(cur, Seq("user_id"))
        .filter($"us" >= $"t" && $"us" <= $"t" + windowUs)
        .groupBy($"user_id").agg(min($"us").as("t"))
      out = out.unionByName(nxt.agg(count(lit(1)).as("users"))
        .select(lit(i + 2).as("step"), lit(st).as("event_type"), $"users"))
      cur = nxt
    }
    out
  }

  /** Retention cohort matrix: cohort = the user's first-activity time
    * bucket, one row per (cohort, age) with the distinct active users.
    * Two aggregates and one user-keyed join.
    */
  def retentionCohorts(events: DataFrame, bucketUs: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val e = events.select($"user_id",
      expr(s"(ts div 1000) div $bucketUs").as("wk"))
    val cohorts = e.groupBy($"user_id").agg(min($"wk").as("cohort"))
    e.join(cohorts, Seq("user_id"))
      .groupBy($"cohort", ($"wk" - $"cohort").as("age"))
      .agg(countDistinct($"user_id").as("active_users"))
  }

  /** Sequence-pattern matching over sessions (MATCH_RECOGNIZE-lite):
    * each session's event types, ordered by (time, event_id), are
    * folded into one comma-joined string and matched against `pattern`
    * (a Java regex). Emits the matching sessions WITH their full
    * sequence string, so the ordered fold itself is verifiable.
    *
    * Rides [[Sessionize.assign]]'s single user_id exchange; the fold is
    * a per-session collect_list whose size is the session length —
    * bounded by the gap rule, never a whole-user timeline.
    */
  def sessionsMatching(events: DataFrame, pattern: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    Sessionize.assign(events)
      .groupBy($"user_id", $"session_id")
      .agg(concat_ws(",",
        expr("transform(array_sort(collect_list(struct(us, event_id, event_type))), x -> x.event_type)"))
        .as("seq"))
      .filter(regexp_like($"seq", lit(pattern)))
  }
}
