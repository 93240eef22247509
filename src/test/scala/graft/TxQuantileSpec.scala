package graft

import graft.sources.TxLog
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-only quantile bounds: certain enclosure, never an estimate. */
class TxQuantileSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def fresh(name: String): String = {
    val dir = s"${GraftSession.scratchBase}/txq_spec_$name"
    fs.delete(new Path(dir), true)
    dir
  }

  test("bounds certainly enclose the exact quantile, for every rank") {
    val t = fresh("encl")
    val vals = (0L until 1000L).map(i => (i * i) % 7919L) // scattered
    (0 until 4).foreach { b =>
      TxLog.commit(spark, t,
        vals.slice(b * 250, (b + 1) * 250).map(v => Tuple1(v)).toDF("x"),
        append = true, collectHistograms = Seq("x" -> 16))
    }
    val sorted = vals.sorted
    val ps = Seq(1, 100, 250, 500, 750, 900, 999, 1000)
    val got = TxLog.quantileBounds(spark, t, "x", ps).get
    got.foreach { case (p, lb, ub) =>
      val r = ((1000L * p + 999L) / 1000L).toInt // ceil rank
      val exact = sorted(r - 1)
      assert(lb <= exact && exact <= ub, s"p=$p: $exact not in [$lb,$ub]")
      assert(lb <= ub)
    }
    // the bounds are informative, not vacuous: median gap well under
    // the full value range
    val (_, lb, ub) = got.find(_._1 == 500).get
    assert(ub - lb < (sorted.last - sorted.head) / 4)
  }

  test("declines on legacy batches, rewrites, and deletion vectors") {
    val t = fresh("decl")
    TxLog.commit(spark, t, Seq(Tuple1(1L)).toDF("x"),
      collectHistograms = Seq("x" -> 8))
    TxLog.commit(spark, t, Seq(Tuple1(2L)).toDF("x"), append = true)
    assert(TxLog.quantileBounds(spark, t, "x", Seq(500)).isEmpty)
    val t2 = fresh("decl2")
    (0 until 2).foreach(b => TxLog.commit(spark, t2,
      (0L until 10L).map(i => Tuple1(b * 10L + i)).toDF("x"),
      append = true, collectHistograms = Seq("x" -> 8)))
    assert(TxLog.quantileBounds(spark, t2, "x", Seq(500)).isDefined)
    TxLog.deleteVectored(spark, t2, "x", Some(3L), Some(3L))
    assert(TxLog.quantileBounds(spark, t2, "x", Seq(500)).isEmpty)
  }

  test("all-null column never records a histogram; nulls don't count") {
    val t = fresh("nulls")
    TxLog.commit(spark, t,
      Seq(Tuple1(Option.empty[Long]), Tuple1(Option.empty[Long])).toDF("x"),
      collectHistograms = Seq("x" -> 8))
    assert(TxLog.quantileBounds(spark, t, "x", Seq(500)).isEmpty)
    val t2 = fresh("nulls2")
    TxLog.commit(spark, t2,
      Seq(Tuple1(Option(5L)), Tuple1(Option.empty[Long]), Tuple1(Option(7L)))
        .toDF("x"),
      collectHistograms = Seq("x" -> 4))
    // N = 2 non-null; p=1000 -> r=2 -> exact 7 within bounds
    val Seq((_, lb, ub)) = TxLog.quantileBounds(spark, t2, "x", Seq(1000)).get
    assert(lb <= 7L && 7L <= ub)
  }

  test("countBounds certainly encloses the exact range count") {
    val t = fresh("cnt")
    val vals = (0L until 1000L).map(i => (i * 37L) % 1009L)
    (0 until 4).foreach { b =>
      TxLog.commit(spark, t,
        vals.slice(b * 250, (b + 1) * 250).map(v => Tuple1(v)).toDF("x"),
        append = true, collectHistograms = Seq("x" -> 16))
    }
    for ((lo, hi) <- Seq((0L, 1008L), (100L, 200L), (500L, 501L), (2000L, 3000L))) {
      val (cMin, cMax) = TxLog.countBounds(spark, t, "x", lo, hi).get
      val exact = vals.count(v => v >= lo && v <= hi).toLong
      assert(cMin <= exact && exact <= cMax, s"[$lo,$hi]: $exact not in [$cMin,$cMax]")
    }
    // whole-domain probe is exact: every bucket fully inside
    assert(TxLog.countBounds(spark, t, "x", -1L, 2000L).get == ((1000L, 1000L)))
    // disjoint probe is exactly zero
    assert(TxLog.countBounds(spark, t, "x", 5000L, 6000L).get == ((0L, 0L)))
    // same decline contract as quantileBounds
    TxLog.deleteVectored(spark, t, "x", Some(3L), Some(3L))
    assert(TxLog.countBounds(spark, t, "x", 0L, 10L).isEmpty)
  }

  test("single-value batches (hi == lo) bound exactly") {
    val t = fresh("const")
    (0 until 3).foreach(_ => TxLog.commit(spark, t,
      Seq.fill(5)(Tuple1(42L)).toDF("x"),
      append = true, collectHistograms = Seq("x" -> 8)))
    val Seq((_, lb, ub)) = TxLog.quantileBounds(spark, t, "x", Seq(500)).get
    assert(lb == 42L && ub == 42L)
  }

  test("a column spanning more than Long range declines histograms") {
    val t = fresh("span64")
    // hi - lo + 1 overflows Long (signed 64-bit hash-key shape): the
    // harvest must DECLINE rather than pack zero-width buckets that
    // quantileBounds would present as CERTAIN wrong bounds
    TxLog.commit(spark, t,
      Seq(Tuple1(Long.MinValue), Tuple1(0L), Tuple1(Long.MaxValue)).toDF("x"),
      collectHistograms = Seq("x" -> 8))
    assert(TxLog.quantileBounds(spark, t, "x", Seq(500)).isEmpty)
    assert(TxLog.countBounds(spark, t, "x", 0L, 10L).isEmpty)
    // a wide-but-representable range still harvests, with BigInt-safe
    // bucket edges (i*w would overflow Long past 2^63/nb)
    val t2 = fresh("span63")
    val (wLo, wHi) = (-(1L << 62), (1L << 62) - 2L) // width = 2^63 - 1: representable
    TxLog.commit(spark, t2,
      Seq(Tuple1(wLo), Tuple1(0L), Tuple1(wHi)).toDF("x"),
      collectHistograms = Seq("x" -> 8))
    val Seq((_, lb, ub)) = TxLog.quantileBounds(spark, t2, "x", Seq(500)).get
    assert(lb <= 0L && 0L <= ub)
    val (cMin, cMax) = TxLog.countBounds(spark, t2, "x", wLo, wHi).get
    assert(cMin <= 3L && cMax >= 3L)
  }
}
