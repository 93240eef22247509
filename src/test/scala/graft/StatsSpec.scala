package graft

import graft.operators.Stats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class StatsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** percentile_disc ground truth: ceil(q·n)-th smallest (1-based). */
  private def disc(xs: Seq[Double], q: Double): Double =
    xs.sorted.apply(math.ceil(q * xs.size).toInt - 1)

  test("exactQuantiles matches the ceil(q·n) order statistic on random groups") {
    val rnd = new Random(7)
    val data = (for {
      g <- Seq("a", "b", "c")
      i <- 1 to 997
    } yield (g, rnd.nextGaussian() * (g.head - 'a' + 1) * 10)).toList
    val df = data.toDF("grp", "v")
    val qs = Seq(0.1, 0.25, 0.5, 0.9, 1.0)
    val got = Stats.exactQuantiles(df, "v", "grp", qs, bins = 16)
      .as[(String, Double, Double)].collect()
      .map { case (g, q, v) => (g, q) -> v }.toMap
    val byG = data.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    for (g <- byG.keys; q <- qs)
      assert(got((g, q)) == disc(byG(g), q), s"grp=$g q=$q")
    assert(got.size == byG.size * qs.size)
  }

  test("exactQuantiles: constant group short-circuits; heavy ties stay exact") {
    val df = (Seq.fill(500)(("flat", 42.0)) ++
      Seq.tabulate(500)(i => ("ties", (i % 3).toDouble))).toDF("grp", "v")
    val got = Stats.exactQuantiles(df, "v", "grp", Seq(0.5, 1.0), bins = 8)
      .as[(String, Double, Double)].collect()
      .map { case (g, q, v) => (g, q) -> v }.toMap
    assert(got(("flat", 0.5)) == 42.0 && got(("flat", 1.0)) == 42.0)
    val ties = Seq.tabulate(500)(i => (i % 3).toDouble)
    assert(got(("ties", 0.5)) == disc(ties, 0.5))
    assert(got(("ties", 1.0)) == 2.0)
  }

  test("madOutliers flags exactly the rows beyond k·MAD") {
    val rnd = new Random(11)
    val body = Seq.tabulate(200)(i => (i.toLong, "g", rnd.nextGaussian()))
    val spikes = Seq((9001L, "g", 500.0), (9002L, "g", -500.0))
    val df = (body ++ spikes).toDF("id", "grp", "v")
    val med = disc(body.map(_._3) ++ spikes.map(_._3), 0.5)
    val devs = (body ++ spikes).map(r => math.abs(r._3 - med))
    val mad = disc(devs, 0.5)
    val expect = (body ++ spikes)
      .filter(r => math.abs(r._3 - med) > 3.0 * mad).map(_._1).toSet
    val got = Stats.madOutliers(df, "id", "v", "grp", k = 3.0)
      .as[(Long, String, Double)].collect().map(_._1).toSet
    assert(got == expect && got.contains(9001L) && got.contains(9002L))
  }

  test("labelCentroids: fixed-point element sums exact; positions ordered") {
    val df = Seq(
      ("a", Seq(1.0f, 2.0f, 3.0f)),
      ("a", Seq(0.5f, -2.0f, 1.25f)),
      ("b", Seq(10.0f, 0.0f, -1.0f)))
      .toDF("label", "embedding")
    val got = graft.operators.Stats.labelCentroids(df, "embedding", "label")
      .as[(String, Long, Seq[Long])].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("a", 2L, Seq(150000L, 0L, 425000L)),
      ("b", 1L, Seq(1000000L, 0L, -100000L))))
  }

  test("quantileBins: band boundaries inclusive-low; bands partition each group") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val binned = graft.operators.Stats.quantileBins(df, "v", "grp")
      .select($"v", $"bin").as[(Double, Int)].collect().toMap
    // boundaries at ceil(q·100): 25, 50, 75 — boundary values stay LOW
    assert(binned(25.0) == 1 && binned(26.0) == 2)
    assert(binned(50.0) == 2 && binned(51.0) == 3)
    assert(binned(75.0) == 3 && binned(76.0) == 4 && binned(100.0) == 4)
    assert(binned.values.toSet == Set(1, 2, 3, 4))
  }

  test("exactQuantiles windows only ever see histogram rows or candidate bins") {
    // Guard against a full per-group sort sneaking in: every Window node
    // must either partition on a key including `bin` (the candidate-bin
    // row_number — ~n/B rows per partition) or sit above the G×B
    // histogram Aggregate (the cumulative locator). A Window partitioned
    // on raw `grp` over the unaggregated input would be a whole-group
    // sort — exactly what this operator exists to avoid.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val df = (1 to 1000).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val plan = Stats.exactQuantiles(df, "v", "grp", Seq(0.5))
      .queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      val onBin = w.partitionSpec.exists(_.references.exists(_.name == "bin"))
      val aboveHistogram = w.child.collectFirst {
        case a: Aggregate if a.groupingExpressions.size == 2 => a }.isDefined
      assert(onBin || aboveHistogram,
        s"window neither bin-partitioned nor above the histogram:\n$w")
    }
  }
}
