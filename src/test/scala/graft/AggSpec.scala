package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AggSpec extends AnyFunSuite {
  import SparkTestSession._

  test("approx_count_distinct (HLL) is within 10% of exact") {
    val li = Tables.lineitem(spark, sf001)
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).head
    val exact = r.getAs[Long]("exact").toDouble
    val approx = r.getAs[Long]("approx").toDouble
    assert(math.abs(approx - exact) / exact < 0.10, s"exact=$exact approx=$approx")
  }

  test("as-of join semantics: ties, tolerance, and no-match rows") {
    val s = spark
    import s.implicits._
    val purchases = Seq(
      (1L, 100L, 1000L),  // exact-tie signup at 1000 → matches
      (1L, 101L, 5000L),  // nearest signup 1000, within tol 10000 → matches
      (2L, 102L, 9000L),  // signup at 2000, gap 7000 ≤ tol → matches
      (3L, 103L, 500L))   // no signup for user 3 → null
      .toDF("user_id", "event_id", "us")
    val signups = Seq((1L, 1000L), (2L, 2000L), (1L, 400L)).toDF("user_id", "us")
    val out = AsOfJoin.backward(purchases, signups, "user_id", "us", tolerance = 10000L)
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("asof_ts")).map(_.toLong)).toMap
    assert(out(100L).contains(1000L)) // tie: signup at same us matches
    assert(out(101L).contains(1000L)) // most recent, not the older 400
    assert(out(102L).contains(2000L))
    assert(out(103L).isEmpty)
  }

  test("as-of join: beyond-tolerance match nulls out") {
    val s = spark
    import s.implicits._
    val purchases = Seq((1L, 100L, 50000L)).toDF("user_id", "event_id", "us")
    val signups = Seq((1L, 1000L)).toDF("user_id", "us")
    val out = AsOfJoin.backward(purchases, signups, "user_id", "us", tolerance = 10000L).head
    assert(out.isNullAt(out.fieldIndex("asof_ts")))
  }

  test("native as-of join: same semantics as the composed sweep, full-row payload, tie-break") {
    val s = spark
    import s.implicits._
    val purchases = Seq(
      (1L, 100L, 1000L), (1L, 101L, 5000L), (2L, 102L, 9000L), (3L, 103L, 500L))
      .toDF("user_id", "event_id", "us")
    val signups = Seq((1L, 1000L, 7L), (2L, 2000L, 8L), (1L, 400L, 9L))
      .toDF("s_user", "s_us", "s_id")
    val out = AsOfJoin.nativeBackward(purchases, signups,
        "user_id", "us", "s_user", "s_us",
        tolerance = 10000L, tieBreak = Seq("s_id"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        ((Option(r.getAs[java.lang.Long]("s_us")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("s_id")).map(_.toLong)))).toMap
    assert(out(100L) == ((Some(1000L), Some(7L)))) // exact tie matches, payload attached
    assert(out(101L) == ((Some(1000L), Some(7L)))) // most recent, not the older 400
    assert(out(102L) == ((Some(2000L), Some(8L))))
    assert(out(103L) == ((None, None)))            // no signup: whole right side null
    // beyond tolerance nulls out
    val far = AsOfJoin.nativeBackward(
      Seq((1L, 100L, 50000L)).toDF("user_id", "event_id", "us"),
      Seq((1L, 1000L)).toDF("s_user", "s_us"),
      "user_id", "us", "s_user", "s_us", tolerance = 10000L).head
    assert(far.isNullAt(far.fieldIndex("s_us")))
    // equal-time right rows: the LAST in tie-break order wins deterministically
    val tie = AsOfJoin.nativeBackward(
      Seq((1L, 100L, 2000L)).toDF("user_id", "event_id", "us"),
      Seq((1L, 1500L, 3L), (1L, 1500L, 11L), (1L, 1500L, 5L)).toDF("s_user", "s_us", "s_id"),
      "user_id", "us", "s_user", "s_us", tieBreak = Seq("s_id")).head
    assert(tie.getAs[Long]("s_id") == 11L)
  }

  test("native as-of join equals the composed sweep on seeded random event sets") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 4) {
      val nL = 30 + rng.nextInt(60)
      val nR = 20 + rng.nextInt(60)
      val purchases = (0 until nL).map(i =>
        (rng.nextInt(8).toLong, i.toLong, rng.nextInt(1000).toLong * 10))
        .toDF("user_id", "event_id", "us")
      val signups = (0 until nR).map(_ =>
        (rng.nextInt(8).toLong, rng.nextInt(1000).toLong * 10)).distinct
        .toDF("s_user", "s_us")
      val tol = (1 + rng.nextInt(300)).toLong * 10
      val composed = AsOfJoin.backward(
          purchases, signups.select($"s_user".as("user_id"), $"s_us".as("us")),
          "user_id", "us", tolerance = tol)
        .collect().map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Long]("asof_ts")).map(_.toLong)).toMap
      val native = AsOfJoin.nativeBackward(purchases, signups,
          "user_id", "us", "s_user", "s_us", tolerance = tol)
        .collect().map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Long]("s_us")).map(_.toLong)).toMap
      assert(native == composed, s"trial $trial mismatch")
    }
  }

  test("KMV sketch: within 15% at k=128, exact below k, partitioning-invariant") {
    import graft.plans.KmvSketchAgg.kmvEstimate
    val li = Tables.lineitem(spark, sf001)
    def runWith(parts: Int) = li.repartition(parts)
      .agg(
        kmvEstimate(col("l_partkey"), 128).as("est"),
        kmvEstimate(col("l_linestatus"), 64).as("est_small"),
        countDistinct(col("l_partkey")).as("exact"))
      .head
    val r = runWith(4)
    val exact = r.getAs[Long]("exact").toDouble
    val est = r.getAs[Double]("est")
    assert(math.abs(est - exact) / exact < 0.15, s"exact=$exact est=$est")
    // below-k groups are exact (l_linestatus has 2 values)
    assert(r.getAs[Double]("est_small") == 2.0)
    // the sketch is a deterministic function of the value SET: any
    // partitioning/merge order yields the identical estimate
    val r13 = runWith(13)
    assert(r13.getAs[Double]("est") == est)
    assert(r13.getAs[Double]("est_small") == 2.0)
  }

  test("Misra-Gries heavy hitters: exact output, candidate superset, partitioning-invariant") {
    import graft.plans.FreqSketchAgg
    import spark.implicits._
    // skewed stream: 'a' 40%, 'b' 25%, 'c' 10%, 50-value long tail
    val rows = (Seq.fill(400)("a") ++ Seq.fill(250)("b") ++ Seq.fill(100)("c") ++
      (0 until 250).map(i => s"t${i % 50}"))
    def run(parts: Int) = FreqSketchAgg.heavyHitters(
        rows.toDF("v").repartition(parts), col("v"), minShare = 0.05)
      .collect().map(r => r.getAs[String]("value") ->
        (r.getAs[Long]("cnt"), r.getAs[Double]("share"))).toMap
    val got = run(4)
    assert(got.keySet == Set("a", "b", "c"), got.toString)
    assert(got("a")._1 == 400L && got("b")._1 == 250L && got("c")._1 == 100L)
    assert(got("a")._2 == 0.4)
    // exactness must not depend on how the sketch was merged
    assert(run(17) == got)
    // tail items (share 0.005 each) never appear even with a tiny minShare
    // that keeps them under the MG guarantee bound
    val fine = FreqSketchAgg.heavyHitters(
      rows.toDF("v"), col("v"), minShare = 0.09)
      .select("value").as[String].collect().toSet
    assert(fine == Set("a", "b", "c"))
  }

  test("heavyHittersBy: per-group exactness with different skew per group") {
    import graft.plans.FreqSketchAgg
    import spark.implicits._
    // g1: 'a' dominates; g2: 'b' dominates and 'a' is tail; g3: uniform tail only
    val rows =
      Seq.fill(80)(("g1", "a")) ++ Seq.fill(15)(("g1", "b")) ++
        (0 until 5).map(i => ("g1", s"t$i")) ++
      Seq.fill(70)(("g2", "b")) ++ Seq.fill(6)(("g2", "a")) ++
        (0 until 24).map(i => ("g2", s"u${i % 12}")) ++
      (0 until 100).map(i => ("g3", s"v${i % 25}"))
    def run(parts: Int) = FreqSketchAgg.heavyHittersBy(
        rows.toDF("g", "v").repartition(parts), col("g"), col("v"), minShare = 0.10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("cnt"), r.getAs[Double]("share"))).toMap
    val got = run(4)
    // exact ground truth per group at 10%
    assert(got.keySet == Set(("g1", "a"), ("g1", "b"), ("g2", "b")), got.toString)
    assert(got(("g1", "a")) == ((80L, 0.8)) && got(("g1", "b")) == ((15L, 0.15)))
    assert(got(("g2", "b"))._1 == 70L)
    // g3 has no value at 10% of 100 — whole group absent
    // merge-order invariance
    assert(run(13) == got)
  }

  test("kmv_distinct and mg_heavy_candidates are callable from SQL (extensions)") {
    import graft.plans.KmvSketchAgg
    Tables.orders(spark, sf0001).createOrReplaceTempView("agg_sql_orders")
    val viaSql = spark.sql(
      """SELECT o_orderstatus,
        |  kmv_distinct(CAST(conv(substring(md5(CAST(o_custkey AS STRING)), 1, 8), 16, 10) AS LONG), 64) AS est
        |FROM agg_sql_orders GROUP BY o_orderstatus""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaApi = Tables.orders(spark, sf0001)
      .groupBy(col("o_orderstatus"))
      .agg(KmvSketchAgg.kmvEstimate(col("o_custkey"), 64).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaSql == viaApi)
    val cand = spark.sql(
      "SELECT mg_heavy_candidates(o_orderstatus, 4) AS c FROM agg_sql_orders")
      .head.getSeq[String](0).toSet
    assert(cand.subsetOf(Set("F", "O", "P")) && cand.nonEmpty, cand.toString)
  }
}
