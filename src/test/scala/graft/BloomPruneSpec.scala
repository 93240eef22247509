package graft

import graft.plans.BloomPrune
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomPruneSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("bloom-pruned semi join equals the plain semi join exactly") {
    val big = T.lineitem.select($"l_orderkey", $"l_quantity")
    val small = T.orders.filter($"o_orderpriority" === "1-URGENT")
    val pruned = BloomPrune.semiJoin(big, small, "l_orderkey", "o_orderkey")
      .as[(Long, Double)].collect().sortBy(identity).toSeq
    val plain = big.join(small.select($"o_orderkey".as("l_orderkey")).distinct(),
        Seq("l_orderkey"), "left_semi")
      .as[(Long, Double)].collect().sortBy(identity).toSeq
    assert(pruned == plain && pruned.nonEmpty)
  }

  test("the bloom probe is codegen'd inside the scan filter, before any exchange") {
    val big = T.lineitem
    val small = T.orders.filter($"o_orderpriority" === "1-URGENT")
    val df = BloomPrune.semiJoin(big, small, "l_orderkey", "o_orderkey")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("bloom_might_contain"),
      s"bloom probe missing from the plan:\n$physical")
    // the probe must be a Filter on the scan side, not post-join
    val filterLine = physical.linesIterator
      .find(l => l.contains("Filter") && l.contains("bloom_might_contain"))
    assert(filterLine.isDefined, s"bloom probe is not a scan-side Filter:\n$physical")
    // and it must not fall back to interpreted eval: after execution the
    // finalized AQE plan prints whole-stage-compiled nodes as `*(n)` —
    // the bloom Filter must carry the star
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    val starred = finalPlan.linesIterator.exists(l =>
      l.contains("bloom_might_contain") &&
        """\*\(\d+\) Filter""".r.findFirstIn(l).isDefined)
    assert(starred, s"bloom probe filter not whole-stage-compiled:\n$finalPlan")
  }

  test("a pruned scan passes strictly fewer rows than the full scan (fpp works)") {
    val big = T.lineitem
    val small = T.orders.filter($"o_orderpriority" === "1-URGENT")
    val bf = small.stat.bloomFilter("o_orderkey", 1000000L, 0.01)
    val bcast = spark.sparkContext.broadcast(bf)
    val kept = big.filter(
      BloomPrune.mightContainLong(bcast, col("l_orderkey"))).count()
    val total = big.count()
    val trueMatch = big.join(
      small.select($"o_orderkey".as("l_orderkey")).distinct(),
      Seq("l_orderkey"), "left_semi").count()
    assert(kept >= trueMatch, "bloom filter dropped a true positive")
    // 1% fpp on an ~80% non-matching population: kept must sit well under total
    assert(kept < trueMatch + (total - trueMatch) / 10,
      s"bloom pruned too little: kept=$kept true=$trueMatch total=$total")
  }

  private object T {
    def lineitem = Tables.lineitem(spark, sf001)
    def orders = Tables.orders(spark, sf001)
  }
}
