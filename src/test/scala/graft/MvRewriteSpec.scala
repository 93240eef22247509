package graft

import graft.plans.MvCatalog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MvRewriteSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val basePath = s"$sf001/documents.parquet"
  private val mvPath = s"${GraftSession.scratchBase}/graft_mv_spec"

  private def baseAgg = spark.read.parquet(basePath)
    .groupBy($"source")
    .agg(count(lit(1)).as("n"), sum($"n_chars").as("total"))

  /** Root paths of every parquet scan in the optimized plan. */
  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        MvCatalog.rootPaths(l)
    }.flatten

  private def registered[A](f: => A): A = {
    MvCatalog.register(spark, "spec_mv", basePath,
      Seq("source"), Seq("n_chars"), mvPath)
    try f finally MvCatalog.drop("spec_mv")
  }

  test("a base-table aggregate is rewritten to scan the view, values unchanged") {
    val direct = baseAgg.as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    registered {
      val df = baseAgg
      val scans = scanPaths(df)
      assert(scans.exists(_.contains("graft_mv_spec")),
        s"aggregate not rewritten to the view: $scans")
      assert(!scans.exists(_.contains("documents.parquet")),
        s"rewritten plan still scans the base: $scans")
      assert(df.as[(String, Long, Long)].collect().sortBy(_._1).toSeq == direct)
    }
  }

  test("rewritten output keeps attribute ids: downstream ops still resolve") {
    registered {
      val df = baseAgg.filter($"n" > 0).orderBy($"source")
        .select($"source", ($"total" / $"n").as("avg_chars"))
      assert(scanPaths(df).exists(_.contains("graft_mv_spec")))
      assert(df.count() > 0)
    }
  }

  test("near-misses fall through: filter, extra group, distinct, stddev, other table") {
    registered {
      val plans = Seq(
        spark.read.parquet(basePath).filter($"lang" === "en")
          .groupBy($"source").agg(count(lit(1)).as("n")),
        spark.read.parquet(basePath) // SUPERSET grouping — view too coarse
          .groupBy($"source", $"lang").agg(count(lit(1)).as("n")),
        spark.read.parquet(basePath)
          .groupBy($"source").agg(countDistinct($"lang").as("n")),
        spark.read.parquet(basePath) // unsupported aggregate function
          .groupBy($"source").agg(stddev($"n_chars").as("a")),
        spark.read.parquet(s"$sf001/orders.parquet")
          .groupBy($"o_orderstatus").agg(count(lit(1)).as("n")))
      plans.foreach { df =>
        val scans = scanPaths(df)
        assert(!scans.exists(_.contains("graft_mv_spec")),
          s"over-eager rewrite: $scans")
      }
    }
  }

  test("a CACHED base still rewrites; a cached filtered subset never does") {
    val cached = spark.read.parquet(basePath).cache()
    try {
      cached.count() // materialize the cache
      registered {
        val agg = cached.groupBy($"source")
          .agg(count(lit(1)).as("n"), sum($"n_chars").as("total"))
        assert(scanPaths(agg).exists(_.contains("graft_mv_spec")),
          "cached base disabled aggregate navigation")
        // a cached FILTERED frame must not be mistaken for the base
        val subset = spark.read.parquet(basePath).filter($"lang" === "en").cache()
        try {
          subset.count()
          val sAgg = subset.groupBy($"source").agg(count(lit(1)).as("n"))
          assert(!scanPaths(sAgg).exists(_.contains("graft_mv_spec")),
            "cached filtered subset wrongly rewrote to the full-table view")
        } finally subset.unpersist()
      }
    } finally cached.unpersist()
  }

  test("invalidate stops the rewrite until re-registration") {
    registered {
      MvCatalog.invalidate("spec_mv")
      assert(!scanPaths(baseAgg).exists(_.contains("graft_mv_spec")),
        "stale view still used")
    }
  }

  // Round-5 advice: find() used to return an ARBITRARY valid entry for
  // the base, so a query subsumed only by the second of two registered
  // views fell through. Every candidate must get a subsumption check.
  test("two views over one base: the one that subsumes the query wins") {
    val mv2 = s"${GraftSession.scratchBase}/graft_mv_spec2"
    MvCatalog.register(spark, "spec_mv_lang", basePath,
      Seq("lang"), Seq("n_chars"), mv2)
    try registered {
      // grouped by source → only spec_mv subsumes (registration order
      // puts spec_mv_lang first in the TrieMap often enough to catch
      // an arbitrary-pick regression either way)
      assert(scanPaths(baseAgg).exists(_.contains("graft_mv_spec")),
        "source-grouped aggregate missed its view")
      val byLang = spark.read.parquet(basePath)
        .groupBy($"lang").agg(count(lit(1)).as("n"))
      assert(scanPaths(byLang).exists(_.contains("graft_mv_spec2")),
        "lang-grouped aggregate missed its view")
    } finally MvCatalog.drop("spec_mv_lang")
  }

  // Round-5 stretch ask: a write landing under a registered base path
  // must invalidate the view WITHOUT a manual invalidate() call.
  test("a base write auto-invalidates: next query falls through to base") {
    val baseCopy = s"${GraftSession.scratchBase}/graft_mv_autobase"
    val mv3 = s"${GraftSession.scratchBase}/graft_mv_spec3"
    spark.read.parquet(basePath).write.mode("overwrite").parquet(baseCopy)
    MvCatalog.register(spark, "spec_mv_auto", baseCopy,
      Seq("source"), Seq("n_chars"), mv3)
    try {
      def agg = spark.read.parquet(baseCopy)
        .groupBy($"source").agg(count(lit(1)).as("n"))
      assert(scanPaths(agg).exists(_.contains("graft_mv_spec3")))
      graft.plans.MvCatalog.invalidateByPath(baseCopy) // what TxLog/TableIO call
      assert(!scanPaths(agg).exists(_.contains("graft_mv_spec3")),
        "view still used after a base write")
    } finally MvCatalog.drop("spec_mv_auto")
  }

  test("rollup: a subset-grouped query re-aggregates the view; values unchanged") {
    def q = spark.read.parquet(basePath).groupBy($"lang")
      .agg(count(lit(1)).as("n"), sum($"n_chars").as("total"),
        min($"n_chars").as("lo"), max($"n_chars").as("hi"),
        avg($"n_chars").as("mean"))
    def g = spark.read.parquet(basePath)
      .agg(count(lit(1)).as("n"), sum($"n_chars").as("total"))
    val direct = q.as[(String, Long, Long, Long, Long, Double)]
      .collect().sortBy(_._1).toSeq
    val gDirect = g.as[(Long, Long)].collect().toSeq
    val mv5 = s"${GraftSession.scratchBase}/graft_mv_spec5"
    MvCatalog.register(spark, "spec_mv_roll", basePath,
      Seq("source", "lang"), Seq("n_chars"), mv5)
    try {
      val scans = scanPaths(q)
      assert(scans.exists(_.contains("graft_mv_spec5")),
        s"subset grouping did not re-aggregate the view: $scans")
      assert(!scans.exists(_.contains("documents.parquet")))
      assert(q.as[(String, Long, Long, Long, Long, Double)]
        .collect().sortBy(_._1).toSeq == direct)
      // GLOBAL aggregate (empty grouping — subset of anything) too
      assert(scanPaths(g).exists(_.contains("graft_mv_spec5")))
      assert(g.as[(Long, Long)].collect().toSeq == gDirect)
    } finally MvCatalog.drop("spec_mv_roll")
  }

  test("rollup guard: float sums fall through; min/max/count still compose") {
    val base2 = s"$sf001/lineitem.parquet"
    def mm = spark.read.parquet(base2).groupBy($"l_returnflag")
      .agg(min($"l_quantity").as("lo"), max($"l_quantity").as("hi"),
        count(lit(1)).as("n"))
    val mmDirect = mm.as[(String, Double, Double, Long)].collect().sortBy(_._1).toSeq
    val mv6 = s"${GraftSession.scratchBase}/graft_mv_spec6"
    MvCatalog.register(spark, "spec_mv_dbl", base2,
      Seq("l_returnflag", "l_linestatus"), Seq("l_quantity"), mv6)
    try {
      // re-summing PARTIAL float sums is order-sensitive → must fall back
      val sums = spark.read.parquet(base2).groupBy($"l_returnflag")
        .agg(sum($"l_quantity").as("s"))
      assert(!scanPaths(sums).exists(_.contains("graft_mv_spec6")),
        "float sum rollup must not rewrite")
      val avgs = spark.read.parquet(base2).groupBy($"l_returnflag")
        .agg(avg($"l_quantity").as("a"))
      assert(!scanPaths(avgs).exists(_.contains("graft_mv_spec6")),
        "float avg rollup must not rewrite")
      // order-insensitive aggregates still ride the view
      assert(scanPaths(mm).exists(_.contains("graft_mv_spec6")))
      assert(mm.as[(String, Double, Double, Long)].collect().sortBy(_._1).toSeq
        == mmDirect)
    } finally MvCatalog.drop("spec_mv_dbl")
  }

  test("exact-match avg rewrites to sum/count over the view (integral only)") {
    def q = spark.read.parquet(basePath).groupBy($"source")
      .agg(avg($"n_chars").as("mean"), count(lit(1)).as("n"))
    val direct = q.as[(String, Double, Long)].collect().sortBy(_._1).toSeq
    registered {
      assert(scanPaths(q).exists(_.contains("graft_mv_spec")),
        "integral avg did not rewrite on an exact grouping match")
      assert(q.as[(String, Double, Long)].collect().sortBy(_._1).toSeq == direct)
    }
  }

  // Round-6 advice #4: the most common real shape — GROUP BY dim WHERE
  // dim = x — is answerable by a view keyed on dim, by filtering the
  // VIEW scan. A predicate on anything not in the view's grouping set
  // must still fall through.
  test("a filter on grouping columns rides the view; on a measure it falls through") {
    val mv7 = s"${GraftSession.scratchBase}/graft_mv_spec7"
    MvCatalog.register(spark, "spec_mv_filt", basePath,
      Seq("source", "lang"), Seq("n_chars"), mv7)
    try {
      // rollup + filter on a view key: view filtered, re-aggregated
      def q = spark.read.parquet(basePath).filter($"lang" === "en")
        .groupBy($"source")
        .agg(count(lit(1)).as("n"), sum($"n_chars").as("total"),
          min($"n_chars").as("lo"))
      MvCatalog.drop("spec_mv_filt") // direct values without the view
      val direct = q.as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
      MvCatalog.register(spark, "spec_mv_filt", basePath,
        Seq("source", "lang"), Seq("n_chars"), mv7)
      val scans = scanPaths(q)
      assert(scans.exists(_.contains("graft_mv_spec7")),
        s"grouping-column filter killed the rewrite: $scans")
      assert(!scans.exists(_.contains("documents.parquet")))
      assert(q.as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq == direct)

      // exact grouping + filter on a view key
      val exact = spark.read.parquet(basePath).filter($"source" === "web")
        .groupBy($"source", $"lang").agg(count(lit(1)).as("n"))
      assert(scanPaths(exact).exists(_.contains("graft_mv_spec7")),
        "exact-group filtered query missed the view")

      // near-miss: predicate on a MEASURE slices within groups
      val onMeasure = spark.read.parquet(basePath).filter($"n_chars" > 100)
        .groupBy($"source").agg(count(lit(1)).as("n"))
      assert(!scanPaths(onMeasure).exists(_.contains("graft_mv_spec7")),
        "measure filter must not rewrite")
      // near-miss: predicate on an ungrouped, unmeasured column
      val onOther = spark.read.parquet(basePath).filter($"doc_id" < 10)
        .groupBy($"source").agg(count(lit(1)).as("n"))
      assert(!scanPaths(onOther).exists(_.contains("graft_mv_spec7")),
        "ungrouped-column filter must not rewrite")
    } finally MvCatalog.drop("spec_mv_filt")
  }

  // Round-6 advice #9: the EXACT-grouping path substituted stored float
  // sums verbatim; the stored double was accumulated in the view
  // build's partition order, not the query's — guard it like rollup.
  test("exact-match float sums fall through too (order-sensitivity guard)") {
    val base2 = s"$sf001/lineitem.parquet"
    val mv8 = s"${GraftSession.scratchBase}/graft_mv_spec8"
    MvCatalog.register(spark, "spec_mv_fexact", base2,
      Seq("l_returnflag", "l_linestatus"), Seq("l_quantity"), mv8)
    try {
      val q = spark.read.parquet(base2)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity").as("s"))
      assert(!scanPaths(q).exists(_.contains("graft_mv_spec8")),
        "exact-grouping float sum must not substitute the stored sum")
      // count/min/max still ride the view on the same exact grouping
      val mm = spark.read.parquet(base2)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), min($"l_quantity").as("lo"))
      assert(scanPaths(mm).exists(_.contains("graft_mv_spec8")))
    } finally MvCatalog.drop("spec_mv_fexact")
  }

  // Round-6 advice #5: auto-REFRESH, not just auto-invalidate — a
  // TxLog-backed registration re-maintains itself on the next lookup.
  test("registerTx: base append → auto-invalidate → next query re-maintains the view") {
    val tableDir = s"${GraftSession.scratchBase}/graft_mv_txauto"
    val mv9 = s"${GraftSession.scratchBase}/graft_mv_spec9"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(tableDir), true)
    fs.delete(new org.apache.hadoop.fs.Path(mv9), true)
    graft.sources.TxLog.commit(spark, tableDir,
      spark.read.parquet(basePath).select($"source", $"n_chars"))
    MvCatalog.registerTx(spark, "spec_mv_txauto", tableDir,
      Seq("source"), Seq("n_chars"), mv9)
    try {
      def agg = graft.sources.TxLog.read(spark, tableDir)
        .groupBy($"source")
        .agg(count(lit(1)).as("n"), sum($"n_chars").as("total"),
          min($"n_chars").as("lo"), max($"n_chars").as("hi"))
      assert(scanPaths(agg).exists(_.contains("graft_mv_spec9")))
      // APPEND: commit flips the view invalid; the next query over the
      // new snapshot must re-maintain INCREMENTALLY and answer from the
      // refreshed view with post-append values
      graft.sources.TxLog.commit(spark, tableDir,
        Seq(("web", 1L), ("newsrc", 9999L)).toDF("source", "n_chars"),
        append = true)
      val direct = graft.sources.TxLog.read(spark, tableDir)
        .groupBy($"source")
        .agg(count(lit(1)).as("n"), sum($"n_chars").as("total"),
          min($"n_chars").as("lo"), max($"n_chars").as("hi"))
      // compute direct values with the rule suspended… by value-checking
      // against the rewritten result AFTER asserting the plan shape
      val scans = scanPaths(agg)
      assert(scans.exists(_.contains("graft_mv_spec9")),
        s"stale registerTx view was not re-maintained on lookup: $scans")
      val got = agg.as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      MvCatalog.drop("spec_mv_txauto")
      val want = direct.as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == want, s"refreshed view diverges from base: $got vs $want")
      assert(got.exists(_._1 == "newsrc"), "appended group missing after refresh")

      // OVERWRITE: non-append commit → full rebuild path
      MvCatalog.registerTx(spark, "spec_mv_txauto", tableDir,
        Seq("source"), Seq("n_chars"), mv9)
      graft.sources.TxLog.commit(spark, tableDir,
        Seq(("solo", 5L)).toDF("source", "n_chars")) // overwrite
      assert(scanPaths(agg).exists(_.contains("graft_mv_spec9")),
        "overwritten base: full-rebuild refresh did not fire")
      val got2 = agg.as[(String, Long, Long, Long, Long)].collect().toSeq
      assert(got2 == Seq(("solo", 1L, 5L, 5L, 5L)), s"rebuild wrong: $got2")
    } finally MvCatalog.drop("spec_mv_txauto")
  }

  test("a refresh that crashed between set-aside and publish recovers on the next lookup (r10 ADVICE)") {
    val tableDir = s"${GraftSession.scratchBase}/graft_mv_txswap"
    val mvS = s"${GraftSession.scratchBase}/graft_mv_specswap"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    for (p <- Seq(tableDir, mvS, mvS + ".refresh-old", mvS + ".refresh-tmp"))
      fs.delete(new org.apache.hadoop.fs.Path(p), true)
    graft.sources.TxLog.commit(spark, tableDir,
      spark.read.parquet(basePath).select($"source", $"n_chars"))
    MvCatalog.registerTx(spark, "spec_mv_txswap", tableDir,
      Seq("source"), Seq("n_chars"), mvS)
    try {
      def agg = graft.sources.TxLog.read(spark, tableDir)
        .groupBy($"source")
        .agg(count(lit(1)).as("n"), sum($"n_chars").as("total"))
      def direct = graft.plans.MvRewriteRule.suspend(
        agg.as[(String, Long, Long)].collect().sortBy(_._1).toSeq)
      assert(scanPaths(agg).exists(_.contains("graft_mv_specswap")))
      // invalidate via an append, then simulate the crash window the
      // old delete-then-rename left: the live dir was set aside, the
      // publish never happened — nothing at mvPath
      graft.sources.TxLog.commit(spark, tableDir,
        Seq(("web", 7L), ("swaps", 42L)).toDF("source", "n_chars"),
        append = true)
      assert(fs.rename(new org.apache.hadoop.fs.Path(mvS),
        new org.apache.hadoop.fs.Path(mvS + ".refresh-old")))
      val got = agg.as[(String, Long, Long)].collect().sortBy(_._1).toSeq
      assert(scanPaths(agg).exists(_.contains("graft_mv_specswap")),
        "recovery did not restore the materialization for the rewrite")
      assert(got == direct, s"recovered view diverges: $got vs $direct")
      assert(got.exists(_._1 == "swaps"), "post-crash refresh lost the append")

      // harsher: NOTHING at mvPath and no set-aside dir either (only a
      // stale tmp) → the refresh must rebuild from the snapshot, never
      // fold a later-version tmp against stale entry metadata
      graft.sources.TxLog.commit(spark, tableDir,
        Seq(("web", 3L)).toDF("source", "n_chars"), append = true)
      assert(fs.rename(new org.apache.hadoop.fs.Path(mvS),
        new org.apache.hadoop.fs.Path(mvS + ".refresh-tmp")))
      val got2 = agg.as[(String, Long, Long)].collect().sortBy(_._1).toSeq
      assert(got2 == direct, s"rebuilt view diverges: $got2 vs $direct")
    } finally {
      MvCatalog.drop("spec_mv_txswap")
      for (p <- Seq(mvS + ".refresh-old", mvS + ".refresh-tmp"))
        fs.delete(new org.apache.hadoop.fs.Path(p), true)
    }
  }

  test("registerTx: DV delete refreshes via the change-feed fold, touched batches only (r9 #2)") {
    val tableDir = s"${GraftSession.scratchBase}/graft_mv_txcdf"
    val mvB = s"${GraftSession.scratchBase}/graft_mv_specB"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(tableDir), true)
    fs.delete(new org.apache.hadoop.fs.Path(mvB), true)
    // 3 key-range batches; group mins live in batch 0, maxes in batch 2
    def part(lo: Long, hi: Long) = spark.range(lo, hi).select(
      $"id", ($"id" % 5L).as("g"), $"id".as("v"))
    (0 until 3).foreach(i => graft.sources.TxLog.commit(spark, tableDir,
      part(i * 100L, i * 100L + 100L), append = i > 0))
    // manifest-pruned probe names the single batch holding ids 150-160
    val touchedDirs = graft.sources.TxLog
      .readWhere(spark, tableDir, "id", Some(150L), Some(160L))
      .inputFiles.map(f => f.substring(0, f.lastIndexOf('/'))).toSet
    assert(touchedDirs.size == 1, s"fixture must confine the delete: $touchedDirs")
    MvCatalog.registerTx(spark, "spec_mv_txcdf", tableDir,
      Seq("g"), Seq("v"), mvB)
    try {
      def agg = graft.sources.TxLog.read(spark, tableDir).groupBy($"g")
        .agg(count(lit(1)).as("n"), sum($"v").as("total"),
          min($"v").as("lo"), max($"v").as("hi"))
      // DV-delete mid-range rows confined to batch 1: no group's stored
      // min/max is touched, so the fold must apply (no rebuild)
      graft.sources.TxLog.deleteVectored(spark, tableDir, "id",
        Some(150L), Some(160L))
      val e = MvCatalog.entry("spec_mv_txcdf").get
      val latest = graft.sources.TxLog.latestVersion(spark, tableDir)
      val folded = MvCatalog.feedFoldPlan(spark, e, latest)
      assert(folded.isDefined, "non-boundary DV delete must fold, not rebuild")
      // IO shape: the fold's only base-table input is the change feed,
      // which must read ONLY the delete's touched batch — never the
      // other base batches. (The merged plan itself is a localCheckpoint
      // — one materialization serving trip check AND write — so the
      // assertion reads the feed's own scan set.)
      val baseFiles = graft.sources.TxLog
        .changeFeed(spark, tableDir, e.tx.get.version, latest)
        .inputFiles.filter(_.contains("graft_mv_txcdf"))
        .filterNot(_.contains("/dv/"))
        .map(f => f.substring(0, f.lastIndexOf('/'))).toSet
      assert(baseFiles == touchedDirs,
        s"fold must read only the touched batch: $baseFiles vs $touchedDirs")
      // end-to-end: purge the vectors (a reorg the feed sees as zero
      // change rows — the rewrite rule can only match a PLAIN relation,
      // and a vectored read plans as a DV anti-join) and the query
      // answers from the view, refreshed through the fold over the
      // delete+purge interval, bit-equal to a fresh aggregate
      graft.sources.TxLog.purgeDeletes(spark, tableDir)
      val e1 = MvCatalog.entry("spec_mv_txcdf").get
      assert(MvCatalog.feedFoldPlan(spark, e1,
        graft.sources.TxLog.latestVersion(spark, tableDir)).isDefined,
        "delete+purge interval must still fold")
      assert(scanPaths(agg).exists(_.contains("graft_mv_specB")),
        "DV-deleted base: feed-fold refresh did not fire")
      val got = agg.as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      val want = graft.sources.TxLog.read(spark, tableDir).groupBy($"g")
        .agg(count(lit(1)).as("n"), sum($"v").as("total"),
          min($"v").as("lo"), max($"v").as("hi"))
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == want, s"folded view diverges: $got vs $want")
      assert(got.map(_._2).sum == 289L, "11 rows must be gone")
      // a delete REMOVING a group's stored min cannot fold — the fold
      // declines and the refresh falls back to a full rebuild
      graft.sources.TxLog.deleteVectored(spark, tableDir, "id",
        Some(0L), Some(0L)) // id 0 = group 0's min v
      val e2 = MvCatalog.entry("spec_mv_txcdf").get
      assert(MvCatalog.feedFoldPlan(spark, e2,
        graft.sources.TxLog.latestVersion(spark, tableDir)).isEmpty,
        "boundary delete must decline the fold")
      graft.sources.TxLog.purgeDeletes(spark, tableDir)
      assert(scanPaths(agg).exists(_.contains("graft_mv_specB")),
        "boundary delete: full-rebuild refresh did not fire")
      val got2 = agg.as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(got2.find(_._1 == 0L).get._4 == 5L,
        s"group 0's min must recompute to 5 after the rebuild: $got2")
    } finally MvCatalog.drop("spec_mv_txcdf")
  }

  test("feedFoldPlan declines a non-null delete against an all-NULL group (review)") {
    val tableDir = s"${GraftSession.scratchBase}/graft_mv_txnull"
    val mvC = s"${GraftSession.scratchBase}/graft_mv_specC"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(tableDir), true)
    fs.delete(new org.apache.hadoop.fs.Path(mvC), true)
    // group 0's stored v is ALL NULL (min/max/sum NULL in the view)
    graft.sources.TxLog.commit(spark, tableDir, spark.range(0L, 40L).select(
      $"id", ($"id" % 2L).as("g"),
      when($"id" % 2L === 0L, lit(null).cast("long")).otherwise($"id").as("v")))
    MvCatalog.registerTx(spark, "spec_mv_txnull", tableDir,
      Seq("g"), Seq("v"), mvC)
    try {
      // insert a non-null value into the all-NULL group, then delete it
      // WITHIN one refresh interval: the fold would compose min/max
      // from the deleted insert and store sum 0 where a fresh aggregate
      // says NULL — the NULL-extreme trip must decline to a rebuild
      graft.sources.TxLog.commit(spark, tableDir,
        Seq((1000L, 0L, 77L)).toDF("id", "g", "v"), append = true)
      graft.sources.TxLog.deleteVectored(spark, tableDir, "id",
        Some(1000L), Some(1000L))
      graft.sources.TxLog.purgeDeletes(spark, tableDir)
      val e = MvCatalog.entry("spec_mv_txnull").get
      assert(MvCatalog.feedFoldPlan(spark, e,
        graft.sources.TxLog.latestVersion(spark, tableDir)).isEmpty,
        "non-null delete against NULL stored extremes must decline")
      // the query path full-rebuilds and group 0 keeps its NULL facts
      def agg = graft.sources.TxLog.read(spark, tableDir).groupBy($"g")
        .agg(count(lit(1)).as("n"), sum($"v").as("total"),
          min($"v").as("lo"), max($"v").as("hi"))
      assert(scanPaths(agg).exists(_.contains("graft_mv_specC")))
      val g0 = agg.filter($"g" === 0L).collect()(0)
      assert(g0.getLong(1) == 20L && g0.isNullAt(2) && g0.isNullAt(3) &&
        g0.isNullAt(4), s"all-NULL group must stay NULL: $g0")
    } finally MvCatalog.drop("spec_mv_txnull")
  }

  test("registerTx with a float measure refreshes by FULL rebuild (no partial re-sum)") {
    val tableDir = s"${GraftSession.scratchBase}/graft_mv_txfloat"
    val mvA = s"${GraftSession.scratchBase}/graft_mv_specA"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(tableDir), true)
    fs.delete(new org.apache.hadoop.fs.Path(mvA), true)
    graft.sources.TxLog.commit(spark, tableDir,
      Seq(("a", 1.5), ("a", 2.5), ("b", 3.25)).toDF("k", "v"))
    MvCatalog.registerTx(spark, "spec_mv_txfloat", tableDir,
      Seq("k"), Seq("v"), mvA)
    try {
      graft.sources.TxLog.commit(spark, tableDir,
        Seq(("b", 0.25)).toDF("k", "v"), append = true)
      // float sums never rewrite (associativity guard), but min/max and
      // count DO — and they must reflect the post-append, fully-rebuilt
      // materialization
      def mm = graft.sources.TxLog.read(spark, tableDir).groupBy($"k")
        .agg(count(lit(1)).as("n"), min($"v").as("lo"), max($"v").as("hi"))
      assert(scanPaths(mm).exists(_.contains("graft_mv_specA")),
        "float-measure registerTx did not refresh")
      val got = mm.as[(String, Long, Double, Double)].collect().sortBy(_._1).toSeq
      assert(got == Seq(("a", 2L, 1.5, 2.5), ("b", 2L, 0.25, 3.25)), s"got $got")
    } finally MvCatalog.drop("spec_mv_txfloat")
  }

  test("TxLog.commit on a registered base path flips the view invalid") {
    val tableDir = s"${GraftSession.scratchBase}/graft_mv_txbase"
    val mv4 = s"${GraftSession.scratchBase}/graft_mv_spec4"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(tableDir), true)
    graft.sources.TxLog.commit(spark, tableDir,
      spark.read.parquet(basePath).select($"source", $"n_chars"))
    val snapshotDirs = graft.sources.TxLog
      .read(spark, tableDir).inputFiles.map(f => f.substring(0, f.lastIndexOf('/')))
    // register over the snapshot's data directory (under tableDir)
    MvCatalog.register(spark, "spec_mv_tx", snapshotDirs.head,
      Seq("source"), Seq("n_chars"), mv4)
    try {
      def agg = spark.read.parquet(snapshotDirs.head)
        .groupBy($"source").agg(count(lit(1)).as("n"))
      assert(scanPaths(agg).exists(_.contains("graft_mv_spec4")))
      graft.sources.TxLog.commit(spark, tableDir,
        spark.read.parquet(basePath).select($"source", $"n_chars").limit(5),
        append = true)
      assert(!scanPaths(agg).exists(_.contains("graft_mv_spec4")),
        "TxLog.commit did not auto-invalidate the view over its table")
    } finally MvCatalog.drop("spec_mv_tx")
  }
}
