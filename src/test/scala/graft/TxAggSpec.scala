package graft

import graft.sources.TxLog
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-only global aggregates (TxAggRule via GraftExtensions):
  * count/min/max/count(col) over a registered `TxLog.table` scan must
  * plan as a one-row LocalRelation — no scan — while matching the
  * scanned answer exactly; and must DECLINE (keep the scan) whenever
  * the manifest cannot answer exactly.
  */
class TxAggSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def fresh(name: String): String = {
    val dir = s"${GraftSession.scratchBase}/txagg_spec_$name"
    fs.delete(new Path(dir), true)
    dir
  }

  private def scanFree(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l
    }.isEmpty

  test("count(*) + min/max + count(col) answer scan-free and exactly") {
    val t = fresh("basic")
    // two appends; s is null on odd ids in the first batch only
    TxLog.commit(spark, t, (0L until 50L)
      .map(i => (i, if (i % 2 == 0) s"v$i" else null, i * 2.0))
      .toDF("id", "s", "d"), append = true)
    TxLog.commit(spark, t, (50L until 80L)
      .map(i => (i, s"v$i", i * 2.0)).toDF("id", "s", "d"), append = true)
    val df = TxLog.table(spark, t).agg(
      count(lit(1)).as("n"), count($"s").as("n_s"),
      min($"id").as("lo"), max($"id").as("hi"),
      min($"d").as("dlo"), max($"d").as("dhi"))
    assert(scanFree(df), "must be answered from the manifest")
    val r = df.collect().head
    assert(r.getAs[Long]("n") == 80L && r.getAs[Long]("n_s") == 55L)
    assert(r.getAs[Long]("lo") == 0L && r.getAs[Long]("hi") == 79L)
    assert(r.getAs[Double]("dlo") == 0.0 && r.getAs[Double]("dhi") == 158.0)
    // identical to the scanned answer through an unregistered read
    val scanned = TxLog.read(spark, t).agg(
      count(lit(1)), count($"s"), min($"id"), max($"id"), min($"d"), max($"d"))
      .collect().head
    assert(r.toSeq == scanned.toSeq)
  }

  test("df.count() itself is metadata-only on a registered table") {
    val t = fresh("count")
    TxLog.commit(spark, t, (0L until 33L).toDF("id"), append = true)
    val df = TxLog.table(spark, t)
    assert(df.count() == 33L)
    assert(scanFree(df.groupBy().count()))
  }

  test("all-null and schema-absent columns: min/max null, count exact") {
    val t = fresh("nulls")
    TxLog.commit(spark, t,
      Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
        .toDF("id", "s"), append = true)
    // second batch predates column s entirely (schema evolution)
    TxLog.commit(spark, t, Seq(Tuple1(3L)).toDF("id"), append = true)
    val df = TxLog.table(spark, t, mergeSchema = true)
      .agg(count(lit(1)).as("n"), count($"s").as("n_s"),
        min($"s").as("lo"), max($"s").as("hi"))
    assert(scanFree(df))
    val r = df.collect().head
    assert(r.getAs[Long]("n") == 3L && r.getAs[Long]("n_s") == 0L)
    assert(r.isNullAt(r.fieldIndex("lo")) && r.isNullAt(r.fieldIndex("hi")))
  }

  test("declines: filters, distinct, other functions, unregistered scans") {
    val t = fresh("decline")
    TxLog.commit(spark, t,
      (0L until 10L).map(i => (i, s"v$i")).toDF("id", "s"), append = true)
    // a filter above the scan must keep the scan (answer would be wrong)
    val filtered = TxLog.table(spark, t).filter($"id" >= 5L).groupBy().count()
    assert(!scanFree(filtered))
    assert(filtered.collect().head.getLong(0) == 5L)
    // distinct declines
    assert(!scanFree(TxLog.table(spark, t).agg(countDistinct($"s"))))
    // sum is not manifest-answerable
    assert(!scanFree(TxLog.table(spark, t).agg(sum($"id"))))
    // a NEVER-registered table's reads decline (registration is
    // table-level: once table() registered t above, plain read()s of t
    // are answerable too — that's the design, so use a fresh table)
    val t2 = fresh("decline2")
    TxLog.commit(spark, t2, (0L until 4L).toDF("id"), append = true)
    assert(!scanFree(TxLog.read(spark, t2).groupBy().count()))
  }

  test("time travel: append-carried dirs answer exactly; replaced dirs decline") {
    val t = fresh("tt")
    TxLog.commit(spark, t, (0L until 5L).toDF("id"), append = true)
    val v1 = TxLog.latestVersion(spark, t)
    TxLog.commit(spark, t, (5L until 9L).toDF("id"), append = true)
    graft.plans.TxPruneRule.register(t)
    // v1's batch dirs are carried forward by the append, and per-dir
    // stats are immutable once committed — so the old snapshot's count
    // is answerable from the latest manifest, scan-free AND exact
    val old = TxLog.read(spark, t, Some(v1)).groupBy().count()
    assert(scanFree(old), "append-carried subset must answer from metadata")
    assert(old.collect().head.getLong(0) == 5L)
    assert(TxLog.table(spark, t).count() == 9L)
    // an OVERWRITE retires the old dirs from the latest manifest: a
    // time-travel read of them must decline (no stats to answer from)
    val t2 = fresh("tt2")
    TxLog.commit(spark, t2, (0L until 5L).toDF("id"), append = true)
    val w1 = TxLog.latestVersion(spark, t2)
    TxLog.commit(spark, t2, (0L until 3L).toDF("id"), append = false)
    graft.plans.TxPruneRule.register(t2)
    val oldW = TxLog.read(spark, t2, Some(w1)).groupBy().count()
    assert(!scanFree(oldW), "replaced dirs have no latest-manifest stats")
    assert(oldW.collect().head.getLong(0) == 5L)
    assert(TxLog.table(spark, t2).count() == 3L)
  }

  // ---- filtered (hybrid) path -----------------------------------------

  /** Batch dirs the optimized plan still scans (empty = fully metadata). */
  private def scannedDirs(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation =>
        l.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.rootPaths.map(_.getName)
    }.flatten.toSet

  test("filtered aggregate: contained batches from metadata, boundary scanned") {
    val t = fresh("hybrid")
    // four key-range batches of 25 ids each
    (0L until 4L).foreach { i =>
      TxLog.commit(spark, t, (i * 25L until (i + 1) * 25L)
        .map(j => (j, if (j % 5L == 0L) null else s"v$j", j * 1.5))
        .toDF("id", "s", "d"), append = true)
    }
    val dirs = TxLog.manifest(spark, t).map(_._1.stripPrefix("data/"))
    assert(dirs.size == 4)
    // [10, 60]: batch0 boundary, batch1 contained, batch2 boundary,
    // batch3 excluded
    val df = TxLog.table(spark, t).filter($"id" >= 10L && $"id" <= 60L)
      .agg(count(lit(1)).as("n"), count($"s").as("n_s"),
        min($"id").as("lo"), max($"id").as("hi"), max($"d").as("dhi"))
    val scanned = scannedDirs(df)
    assert(scanned.size == 2, s"only the two boundary batches scan: $scanned")
    val truth = TxLog.read(spark, t).filter($"id" >= 10L && $"id" <= 60L)
      .agg(count(lit(1)), count($"s"), min($"id"), max($"id"), max($"d"))
      .collect().head
    assert(df.collect().head.toSeq == truth.toSeq)
  }

  test("fully-covered filter answers scan-free; all-excluded too") {
    val t = fresh("covered")
    TxLog.commit(spark, t, (0L until 30L).toDF("id"), append = true)
    TxLog.commit(spark, t, (30L until 60L).toDF("id"), append = true)
    val all = TxLog.table(spark, t).filter($"id" >= 0L && $"id" < 60L)
      .agg(count(lit(1)).as("n"), max($"id").as("hi"))
    assert(scanFree(all), "every batch contained -> zero scan")
    assert(all.collect().head.toSeq == Seq(60L, 59L))
    // one whole batch selected by range
    val one = TxLog.table(spark, t).filter($"id" >= 30L)
      .agg(count(lit(1)).as("n"), min($"id").as("lo"))
    assert(scanFree(one))
    assert(one.collect().head.toSeq == Seq(30L, 30L))
  }

  test("nulls in a compared column block containment (count stays exact)") {
    val t = fresh("nullfilter")
    TxLog.commit(spark, t, (0L until 10L).map(i => Tuple1(Option(i)))
      .toDF("id"), append = true)
    // second batch holds 3 null ids INSIDE the probe's key range — if it
    // were treated as contained, count would include rows the filter drops
    TxLog.commit(spark, t,
      ((10L until 20L).map(Option(_)) ++ Seq.fill(3)(Option.empty[Long]))
        .map(Tuple1(_)).toDF("id"), append = true)
    val df = TxLog.table(spark, t).filter($"id" <= 19L)
      .agg(count(lit(1)).as("n"))
    // batch0 contained (no nulls), batch1 must scan (nulls fail filters)
    assert(scannedDirs(df).size == 1)
    assert(df.collect().head.getLong(0) == 20L)
  }

  test("strict bounds respect strictness at batch edges") {
    val t = fresh("strict")
    TxLog.commit(spark, t, (0L until 10L).toDF("id"), append = true)
    TxLog.commit(spark, t, (10L until 20L).toDF("id"), append = true)
    // id > 9: batch0 (max 9) excluded, batch1 (min 10) contained
    val gt = TxLog.table(spark, t).filter($"id" > 9L).groupBy().count()
    assert(scanFree(gt))
    assert(gt.collect().head.getLong(0) == 10L)
    // id >= 9: batch0 is boundary (9 qualifies) -> hybrid
    val ge = TxLog.table(spark, t).filter($"id" >= 9L).groupBy().count()
    assert(scannedDirs(ge).size == 1)
    assert(ge.collect().head.getLong(0) == 11L)
    // id < 10 / id <= 10 mirror
    val lt10 = TxLog.table(spark, t).filter($"id" < 10L).groupBy().count()
    assert(scanFree(lt10) && lt10.collect().head.getLong(0) == 10L)
    val le10 = TxLog.table(spark, t).filter($"id" <= 10L).groupBy().count()
    assert(scannedDirs(le10).size == 1 && le10.collect().head.getLong(0) == 11L)
  }

  test("equality and string ranges classify; point eq on a constant batch") {
    val t = fresh("eqstr")
    TxLog.commit(spark, t, (0 until 8).map(i => (i.toLong, "alpha"))
      .toDF("id", "g"), append = true)
    TxLog.commit(spark, t, (8 until 16).map(i => (i.toLong, "beta"))
      .toDF("id", "g"), append = true)
    // g = 'alpha': batch0 constant-equal -> contained; batch1 excluded
    val eq = TxLog.table(spark, t).filter($"g" === "alpha").groupBy().count()
    assert(scanFree(eq))
    assert(eq.collect().head.getLong(0) == 8L)
    // string range covering only beta
    val rng = TxLog.table(spark, t).filter($"g" >= "b").groupBy().count()
    assert(scanFree(rng) && rng.collect().head.getLong(0) == 8L)
  }

  test("any untranslatable conjunct declines the WHOLE filtered rewrite") {
    val t = fresh("declinef")
    TxLog.commit(spark, t, (0L until 10L).toDF("id"), append = true)
    TxLog.commit(spark, t, (10L until 20L).toDF("id"), append = true)
    // (id >= 0) alone would be fully contained, but the modulo conjunct
    // changes selectivity inside contained batches — must keep the scan
    val mixed = TxLog.table(spark, t)
      .filter($"id" >= 0L && $"id" % 2L === 0L).groupBy().count()
    assert(!scanFree(mixed))
    assert(mixed.collect().head.getLong(0) == 10L)
    // OR never translates
    val or = TxLog.table(spark, t)
      .filter($"id" < 3L || $"id" > 16L).groupBy().count()
    assert(!scanFree(or))
    assert(or.collect().head.getLong(0) == 6L)
  }

  test("hybrid min/max merge metadata and boundary sides correctly") {
    val t = fresh("minmax")
    TxLog.commit(spark, t, (0L until 10L).map(i => (i, i * 2.0))
      .toDF("id", "d"), append = true)
    TxLog.commit(spark, t, (10L until 20L).map(i => (i, i * 2.0))
      .toDF("id", "d"), append = true)
    // [5, 19]: batch0 boundary, batch1 contained. min(d) comes from the
    // boundary scan (10.0), max(d) from contained metadata (38.0)
    val df = TxLog.table(spark, t).filter($"id" >= 5L)
      .agg(min($"d").as("lo"), max($"d").as("hi"), count(lit(1)).as("n"))
    assert(scannedDirs(df).size == 1)
    assert(df.collect().head.toSeq == Seq(10.0, 38.0, 15L))
  }

  // ---- grouped (batch-constant) path -----------------------------------

  test("GROUP BY a batch-constant column answers scan-free per batch") {
    val t = fresh("grouped_const")
    // append-per-day shape: each commit holds ONE day
    Seq("2024-01-01", "2024-01-02", "2024-01-03").zipWithIndex.foreach {
      case (day, i) =>
        TxLog.commit(spark, t, (0L until (i + 1) * 4L)
          .map(j => (j, day, if (j % 2 == 0) s"u$j" else null))
          .toDF("id", "day", "u"), append = true)
    }
    val df = TxLog.table(spark, t).groupBy($"day")
      .agg(count(lit(1)).as("n"), count($"u").as("n_u"),
        min($"id").as("lo"), max($"id").as("hi"))
    assert(scanFree(df), "every batch is day-constant -> zero scans")
    val got = df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(
      "2024-01-01" -> ((4L, 2L, 0L, 3L)),
      "2024-01-02" -> ((8L, 4L, 0L, 7L)),
      "2024-01-03" -> ((12L, 6L, 0L, 11L))))
    // identical to the scanned answer through an unregistered read
    val truth = TxLog.read(spark, t).groupBy($"day")
      .agg(count(lit(1)), count($"u"), min($"id"), max($"id"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == truth)
  }

  test("same group across batches re-merges; multi-valued batches scan") {
    val t = fresh("grouped_merge")
    TxLog.commit(spark, t, (0L until 6L).map(i => (i, "a"))
      .toDF("id", "g"), append = true)
    TxLog.commit(spark, t, (6L until 10L).map(i => (i, "a"))
      .toDF("id", "g"), append = true)
    // third batch holds TWO groups -> must scan (min != max)
    TxLog.commit(spark, t, Seq((10L, "a"), (11L, "b"))
      .toDF("id", "g"), append = true)
    val df = TxLog.table(spark, t).groupBy($"g")
      .agg(count(lit(1)).as("n"), max($"id").as("hi"))
    assert(scannedDirs(df).size == 1, "only the mixed batch scans")
    val got = df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("a" -> ((11L, 10L)), "b" -> ((1L, 11L))))
  }

  test("all-null group batch lands in the NULL group exactly") {
    val t = fresh("grouped_null")
    TxLog.commit(spark, t,
      (0L until 3L).map(i => (i, Option.empty[String])).toDF("id", "g"),
      append = true)
    TxLog.commit(spark, t,
      (3L until 8L).map(i => (i, Option("x"))).toDF("id", "g"), append = true)
    val df = TxLog.table(spark, t).groupBy($"g").agg(count(lit(1)).as("n"))
    assert(scanFree(df))
    val got = df.collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(got == Map(None -> 3L, Some("x") -> 5L))
  }

  test("grouped + filtered: excluded / metadata / boundary compose") {
    val t = fresh("grouped_filter")
    // day-constant batches of ids 0-9 / 10-19 / 20-29
    Seq("d1", "d2", "d3").zipWithIndex.foreach { case (day, i) =>
      TxLog.commit(spark, t, (i * 10L until (i + 1) * 10L)
        .map(j => (j, day)).toDF("id", "day"), append = true)
    }
    // id <= 14: d1 contained, d2 boundary, d3 excluded
    val df = TxLog.table(spark, t).filter($"id" <= 14L)
      .groupBy($"day").agg(count(lit(1)).as("n"))
    assert(scannedDirs(df).size == 1)
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("d1" -> 10L, "d2" -> 5L))
  }

  test("grouping by an expression (not a bare column) declines") {
    val t = fresh("grouped_expr")
    TxLog.commit(spark, t, (0L until 10L).map(i => (i, "a"))
      .toDF("id", "g"), append = true)
    val df = TxLog.table(spark, t).groupBy(substring($"g", 1, 1)).count()
    assert(!scanFree(df))
    assert(df.collect().head.getLong(1) == 10L)
  }

  test("a batch with nulls mixed into the group column scans") {
    val t = fresh("grouped_mixed_null")
    TxLog.commit(spark, t,
      ((0L until 4L).map(i => (i, Option("a"))) ++ Seq((4L, Option.empty[String])))
        .toDF("id", "g"), append = true)
    TxLog.commit(spark, t, (5L until 9L).map(i => (i, Option("b")))
      .toDF("id", "g"), append = true)
    val df = TxLog.table(spark, t).groupBy($"g").agg(count(lit(1)).as("n"))
    assert(scannedDirs(df).size == 1,
      "the value+null batch is NOT constant: it holds two groups")
    val got = df.collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(got == Map(Some("a") -> 4L, None -> 1L, Some("b") -> 4L))
  }

  test("int and date columns parse back to the scan attribute's type") {
    val t = fresh("typed")
    val df0 = Seq((1, java.sql.Date.valueOf("2024-01-15")),
      (7, java.sql.Date.valueOf("2024-03-02"))).toDF("i", "day")
    TxLog.commit(spark, t, df0, append = true)
    val df = TxLog.table(spark, t)
      .agg(min($"i").as("ilo"), max($"i").as("ihi"),
        min($"day").as("dlo"), max($"day").as("dhi"))
    assert(scanFree(df))
    val r = df.collect().head
    assert(r.getAs[Int]("ilo") == 1 && r.getAs[Int]("ihi") == 7)
    assert(r.getAs[java.sql.Date]("dlo").toString == "2024-01-15")
    assert(r.getAs[java.sql.Date]("dhi").toString == "2024-03-02")
  }

  test("histogram salvage: aligned straddling counts answer scan-free") {
    val t = fresh("histsalv")
    // code spans 0..9 with 16 buckets -> single-valued buckets: every
    // range probe aligns, so straddling batches salvage exactly
    TxLog.commit(spark, t, (0L until 40L).map(i => (i, i % 10L))
      .toDF("id", "code"), append = true,
      collectHistograms = Seq("code" -> 16))
    TxLog.commit(spark, t, (40L until 100L).map(i => (i, i % 10L))
      .toDF("id", "code"), append = true,
      collectHistograms = Seq("code" -> 16))
    val df = TxLog.table(spark, t).filter($"code" >= 3L && $"code" <= 6L)
      .agg(count(lit(1)).as("n"), count($"code").as("nc"))
    assert(scanFree(df), "aligned histogram salvage must not scan:\n" +
      df.queryExecution.optimizedPlan.toString.take(1200))
    val r = df.collect().head
    assert(r.getAs[Long]("n") == 40L && r.getAs[Long]("nc") == 40L)
  }

  test("histogram salvage: provably-empty boundary batches drop from the plan") {
    val t = fresh("histdrop")
    // batch values cluster at 0..9 and 90..99: min/max straddle a mid
    // probe but the histogram (single-valued buckets) proves it empty
    TxLog.commit(spark, t,
      ((0L until 10L) ++ (90L until 100L)).map(i => (i, i)).toDF("id", "code"),
      append = true, collectHistograms = Seq("code" -> 128))
    TxLog.commit(spark, t, (40L until 50L).map(i => (i, i)).toDF("id", "code"),
      append = true, collectHistograms = Seq("code" -> 128))
    val df = TxLog.table(spark, t).filter($"code" >= 42L && $"code" <= 47L)
      .agg(count(lit(1)).as("n"))
    assert(scanFree(df))
    assert(df.collect().head.getAs[Long]("n") == 6L)
  }

  test("histogram salvage declines: non-aligned probes scan the boundary and stay exact") {
    val t = fresh("histfall")
    // wide value range (0..999) with 8 buckets -> 125-wide buckets: a
    // probe cutting through a bucket cannot be pinned, so the batch
    // scans — and the answer still matches the brute recount
    TxLog.commit(spark, t, (0L until 1000L).map(i => (i, i)).toDF("id", "code"),
      append = true, collectHistograms = Seq("code" -> 8))
    val df = TxLog.table(spark, t).filter($"code" >= 130L && $"code" <= 140L)
      .agg(count(lit(1)).as("n"))
    assert(!scanFree(df), "a mid-bucket probe must fall back to the scan")
    assert(df.collect().head.getAs[Long]("n") == 11L)
    // min/max through a straddling batch also stay scan-backed
    val mm = TxLog.table(spark, t).filter($"code" >= 100L && $"code" <= 300L)
      .agg(min($"code").as("lo"), max($"code").as("hi"))
    val r = mm.collect().head
    assert(r.getAs[Long]("lo") == 100L && r.getAs[Long]("hi") == 300L)
    // and a batch WITHOUT a histogram never salvages
    val t2 = fresh("histnone")
    TxLog.commit(spark, t2, (0L until 20L).map(i => (i, i % 5L))
      .toDF("id", "code"), append = true)
    val df2 = TxLog.table(spark, t2).filter($"code" >= 1L && $"code" <= 3L)
      .agg(count(lit(1)).as("n"))
    assert(!scanFree(df2))
    assert(df2.collect().head.getAs[Long]("n") == 12L)
  }

  test("histogram salvage: count(other col) needs a proven zero null count") {
    val t = fresh("histnull")
    TxLog.commit(spark, t,
      (0L until 30L).map(i => (i, i % 10L, if (i % 3L == 0L) null else s"v$i"))
        .toDF("id", "code", "s"),
      append = true, collectHistograms = Seq("code" -> 16))
    // count(s) over a straddling batch with s-nulls: must scan, exact
    val df = TxLog.table(spark, t).filter($"code" >= 2L && $"code" <= 5L)
      .agg(count($"s").as("ns"))
    assert(!scanFree(df))
    assert(df.collect().head.getAs[Long]("ns") == 8L)
    // count(id) with id never null: salvages scan-free
    val df2 = TxLog.table(spark, t).filter($"code" >= 2L && $"code" <= 5L)
      .agg(count($"id").as("ni"))
    assert(scanFree(df2))
    assert(df2.collect().head.getAs[Long]("ni") == 12L)
  }
}
