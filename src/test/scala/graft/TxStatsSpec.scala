package graft

import graft.sources.TxLog
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TxStatsRule (round-9 ask #4): manifest-exact row counts must reach
  * Catalyst's planner for registered TxLog scans, flipping
  * broadcast-vs-merge decisions that file-byte estimation gets wrong.
  */
class TxStatsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def fresh(name: String): String = {
    val dir = s"${GraftSession.scratchBase}/txstats_spec_$name"
    fs.delete(new Path(dir), true)
    dir
  }

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("misestimated-by-bytes join flips to sort-merge when registered (no hint)") {
    val t = fresh("flip")
    // 200k rows of a CONSTANT 400-char pad: zstd crushes the files to a
    // few KB (⇒ file-byte estimation says "broadcastable") while the
    // in-memory relation is tens of MB — the exact shape that used to
    // OOM drivers before the operator-level pins
    val big = spark.range(0L, 200000L).select(col("id").as("k"),
      lit("x" * 400).as("pad"))
    TxLog.commit(spark, t, big)
    val fileBytes = fs.getContentSummary(new Path(s"$t/data")).getLength
    val other = spark.range(0L, 200000L)
      .select(col("id").as("k"), (col("id") % 5L).as("g"))
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (1L << 20).toString)
      assert(fileBytes < (1L << 20),
        s"fixture files must under-shoot the 1 MB threshold, got $fileBytes")
      // UNREGISTERED: the planner sees only compressed file bytes and
      // (wrongly, at scale) broadcasts the 200k-row side
      val pUnreg = plan(other.join(TxLog.read(spark, t), "k"))
      assert(pUnreg.contains("BroadcastHashJoin"),
        "control arm: byte-estimation should broadcast:\n" + pUnreg.take(1200))
      // REGISTERED: manifest row count × schema row width > threshold ⇒
      // the same join plans sort-merge with no hint anywhere
      val pReg = plan(other.join(TxLog.table(spark, t), "k"))
      assert(pReg.contains("SortMergeJoin") && !pReg.contains("BroadcastHashJoin"),
        "manifest stats must flip the strategy:\n" + pReg.take(1200))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("a genuinely small registered table still broadcasts (stats are exact, not a pin)") {
    val t = fresh("small")
    TxLog.commit(spark, t, spark.range(0L, 50L)
      .select(col("id").as("k"), lit("y").as("tag")))
    val other = spark.range(0L, 100000L).select(col("id").as("k"))
    val p = plan(other.join(TxLog.table(spark, t), "k"))
    assert(p.contains("BroadcastHashJoin"),
      "50 exact rows must stay broadcastable:\n" + p.take(1200))
  }

  test("CBO: manifest column stats cost a selective filter from facts — filtered side broadcasts, no hint") {
    val t = fresh("cbo")
    // wide enough that the UNfiltered 200k rows overshoot the 1 MB
    // threshold by row-width arithmetic alone
    val big = spark.range(0L, 200000L).select(col("id").as("k"),
      lit("x" * 60).as("pad"))
    TxLog.commit(spark, t, big, collectSketches = Seq(("k", 1024)))
    val other = spark.range(0L, 200000L)
      .select(col("id").as("k"), (col("id") % 7L).as("g"))
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val cbo = spark.conf.get("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (1L << 20).toString)
      // rowCount alone can't see through a Filter: the unestimated
      // filtered side keeps the full-table size and plans sort-merge
      spark.conf.set("spark.sql.cbo.enabled", "false")
      val pOff = plan(other.join(TxLog.table(spark, t).filter(col("k") < 50L), "k"))
      assert(pOff.contains("SortMergeJoin") && !pOff.contains("BroadcastHashJoin"),
        "control arm: without CBO the filtered side must stay unestimated:\n" +
          pOff.take(1200))
      // with CBO, FilterEstimation consumes the manifest-fed min/max/
      // NDV/nulls: est. rows ≈ (50/200000)·200000 = 50 ⇒ the filtered
      // side is provably tiny and broadcasts — ANALYZE TABLE's outcome
      // from stats harvested free at commit
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val pOn = plan(other.join(TxLog.table(spark, t).filter(col("k") < 50L), "k"))
      assert(pOn.contains("BroadcastHashJoin"),
        "column stats must make the selective filter broadcastable:\n" +
          pOn.take(1200))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
      spark.conf.set("spark.sql.cbo.enabled", cbo)
    }
  }

  test("CBO join reorder: stats move the selective dim below the exploding one") {
    val t1 = fresh("reo_d1"); val t2 = fresh("reo_d2")
    // fact: 200k rows; k1 explodes against d1 (NDV 1000 ⇒ est. 40M
    // intermediate), k2 is selective against d2 (50 of 200k keys ⇒
    // est. 50 rows). Syntactic order joins d1 FIRST — the plan a 100 TB
    // run cannot afford.
    val fact = spark.range(0L, 200000L).select(
      (col("id") % 1000L).as("k1"), col("id").as("k2"))
    val d1 = spark.range(0L, 200000L).select(
      (col("id") % 1000L).as("k1"), (col("id") % 7L).as("a"))
    val d2 = spark.range(0L, 50L).select(
      (col("id") * 4000L).as("k2"), (col("id") % 3L).as("b"))
    TxLog.commit(spark, t1, d1, collectSketches = Seq(("k1", 1024)))
    TxLog.commit(spark, t2, d2, collectSketches = Seq(("k2", 1024)))
    val cbo = spark.conf.get("spark.sql.cbo.enabled")
    val reo = spark.conf.get("spark.sql.cbo.joinReorder.enabled")
    def joined = fact
      .join(TxLog.table(spark, t1), "k1")
      .join(TxLog.table(spark, t2), "k2")
    def topJoinKey(df: DataFrame): String = {
      val s = df.queryExecution.optimizedPlan.toString
      val j = s.linesIterator.find(_.contains("Join")).getOrElse("")
      if (j.contains("k2")) "k2" else if (j.contains("k1")) "k1" else "?"
    }
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      // control: syntactic order — d2's k2 join sits on top, so the
      // 40M-row k1 explosion happens first
      assert(topJoinKey(joined) == "k2",
        "control arm must keep the syntactic order")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      // reordered: the selective k2 join moves below, k1 on top —
      // the exploding join now sees 50 rows, not 200k
      assert(topJoinKey(joined) == "k1",
        "manifest NDV must let CostBasedJoinReorder move the selective join first:\n" +
          joined.queryExecution.optimizedPlan.toString.take(1500))
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", cbo)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", reo)
    }
  }

  test("row counts survive manifest-pruned subset scans; tombstones NOT subtracted (safe direction)") {
    val t = fresh("subset")
    (0L until 4L).foreach { i =>
      TxLog.commit(spark, t, spark.range(i * 100L, (i + 1) * 100L)
        .select(col("id").as("k"), lit("z").as("tag")), append = true)
    }
    TxLog.deleteVectored(spark, t, "k", Some(0L), Some(49L))
    def scanRows(df: DataFrame): BigInt =
      df.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
            if l.catalogTable.exists(_.stats.isDefined) =>
          l.catalogTable.get.stats.get.rowCount.get
      }.foldLeft(BigInt(0))(_ + _)
    graft.plans.TxPruneRule.register(t)
    // full read: 400 FOOTER rows across the DV-split scan halves — the
    // 50 tombstones are deliberately not subtracted (an asOf scan of
    // the same dirs returns them, and over-estimating is the safe
    // direction for broadcast decisions); the dv SIDECAR scan gets no
    // stats — its files aren't manifest batch dirs
    assert(scanRows(TxLog.read(spark, t)) == BigInt(400),
      "footer row count must reach the planner")
    // a manifest-pruned subset reports exactly the touched batches
    val sub = TxLog.readWhere(spark, t, "k", Some(150L), Some(250L))
    assert(scanRows(sub) == BigInt(200),
      "subset scan must report the touched fraction's rows")
  }
}
