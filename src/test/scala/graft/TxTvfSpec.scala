package graft

import graft.sources.TxLog
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL table-valued functions over the lakehouse
  * ([[graft.plans.TxTableFunctions]], injected via GraftExtensions):
  * a SQL-only consumer must get the same tables, the same time travel,
  * the same CDC rows, and the same plan-level wins (manifest pruning,
  * DV anti-joins) the Scala API delivers.
  */
class TxTvfSpec extends AnyFunSuite {
  import SparkTestSession._

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def fresh(name: String): String = {
    val dir = s"${GraftSession.scratchBase}/tvf_$name"
    fs.delete(new Path(dir), true)
    dir
  }

  private def sameBag(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  private def data(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).select(col("id").as("k"),
      (col("id") % 10L).as("g"), (col("id") * 3L).as("v"))

  test("graft_snapshot: latest and time travel match the Scala reads") {
    val t = fresh("snap")
    TxLog.commit(spark, t, data(0L, 100L))
    TxLog.commit(spark, t, data(100L, 150L), append = true)
    assert(sameBag(spark.sql(s"SELECT * FROM graft_snapshot('$t')"),
      TxLog.read(spark, t)))
    assert(sameBag(spark.sql(s"SELECT * FROM graft_snapshot('$t', 1)"),
      TxLog.read(spark, t, asOf = Some(1L))))
    // composes like any table: filters, aggregates, joins
    val n = spark.sql(
      s"SELECT g, count(*) AS n FROM graft_snapshot('$t') WHERE k >= 100 GROUP BY g")
    assert(n.agg(sum(col("n"))).head().getLong(0) == 50L)
  }

  test("graft_snapshot: manifest pruning reaches SQL filters (latest only)") {
    val t = fresh("snap_prune")
    (0 until 4).foreach(i => TxLog.commit(spark, t,
      data(i * 100L, i * 100L + 100L), append = i > 0))
    val pruned = spark.sql(
      s"SELECT k FROM graft_snapshot('$t') WHERE k >= 310")
    assert(pruned.inputFiles.map(f => new Path(f).getParent.getName)
      .toSet.size == 1,
      "a key-range SQL filter must manifest-prune to one batch")
    assert(pruned.count() == 90L)
  }

  test("graft_snapshot: a vectored snapshot serves LIVE rows through SQL") {
    val t = fresh("snap_dv")
    TxLog.commit(spark, t, data(0L, 100L))
    TxLog.deleteVectored(spark, t, "k", Some(10L), Some(19L))
    val got = spark.sql(s"SELECT count(*) AS n FROM graft_snapshot('$t')")
      .head().getLong(0)
    assert(got == 90L, "tombstoned rows must not resurrect through the TVF")
  }

  test("graft_changes: the SQL CDC read equals TxLog.changeFeed") {
    val t = fresh("changes")
    TxLog.commit(spark, t, data(0L, 200L))
    TxLog.commit(spark, t, data(200L, 300L), append = true)
    TxLog.deleteVectored(spark, t, "k", Some(50L), Some(60L))
    val v = TxLog.latestVersion(spark, t)
    assert(sameBag(spark.sql(s"SELECT * FROM graft_changes('$t', 1, $v)"),
      TxLog.changeFeed(spark, t, 1L, v)))
    // a SQL consumer folds the feed with plain aggregation
    val net = spark.sql(
      s"""SELECT sum(CASE WHEN _change_type = 'insert' THEN 1 ELSE -1 END) AS net
         |FROM graft_changes('$t', 1, $v)""".stripMargin)
      .head().getLong(0)
    assert(net == TxLog.read(spark, t).count() - 200L,
      "net feed delta must equal the snapshot growth since v1")
  }

  test("graft_history lists the commit log newest-first") {
    val t = fresh("hist")
    (0 until 3).foreach(i => TxLog.commit(spark, t,
      data(i * 10L, i * 10L + 10L), append = i > 0))
    val h = spark.sql(
      s"SELECT version, operation FROM graft_history('$t')").collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(3L, 2L, 1L))
    assert(h.forall(_.getString(1) != null))
  }

  test("graft_consumers: the retention-runbook lag query (r10)") {
    val t = fresh("consumers")
    (0 until 4).foreach(i => TxLog.commit(spark, t,
      data(i * 10L, i * 10L + 10L), append = i > 0))
    TxLog.ackConsumer(spark, t, "etl", 2L)
    TxLog.ackConsumer(spark, t, "dash", 4L)
    val got = spark.sql(
      s"SELECT consumer, acked_version, lag FROM graft_consumers('$t') ORDER BY consumer")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("dash", 4L, 0L), ("etl", 2L, 2L)))
    // who would retainFrom=3 break? exactly the lagging consumer
    val broken = spark.sql(
      s"SELECT consumer FROM graft_consumers('$t') WHERE acked_version < 3")
      .collect().map(_.getString(0)).toSeq
    assert(broken == Seq("etl"))
  }

  test("graft_consistent and graft_tag: cut and named-snapshot reads from pure SQL (r12)") {
    val root = fresh("cut")
    val (t, m, x) = (s"$root/t", s"$root/m", s"$root/x")
    TxLog.commitMulti(spark, x, Seq(
      TxLog.MultiWrite(t, data(0L, 40L)), TxLog.MultiWrite(m, data(40L, 50L))))
    TxLog.tag(spark, x, "run-1", Seq(t, m))
    // a second multi-table txn, decided and HALF-published (torn)
    val (id, staged) = TxLog.stageMulti(spark, x, Seq(
      TxLog.MultiWrite(t, data(50L, 80L), append = true),
      TxLog.MultiWrite(m, data(80L, 90L), append = true)))
    TxLog.decideMulti(spark, x, id, staged)
    TxLog.publishStaged(spark, staged.head)
    // the plain latest read sees the tear; the consistent TVF hides it
    assert(TxLog.read(spark, t).count() == 70L)
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft_consistent('$x', '$t')")
      .head().getLong(0) == 40L)
    assert(sameBag(
      spark.sql(s"SELECT * FROM graft_consistent('$x', '$m')"),
      TxLog.readConsistent(spark, x, Seq(m))(m)))
    // the tag TVF reads exactly the pinned cut, after recovery too
    TxLog.recoverMulti(spark, x)
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft_tag('$x', 'run-1', '$t')")
      .head().getLong(0) == 40L)
    assert(sameBag(
      spark.sql(s"SELECT * FROM graft_tag('$x', 'run-1', '$m')"),
      TxLog.readTag(spark, x, "run-1")(m)))
    // a table the tag does not pin fails loud, naming what it does pin
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM graft_tag('$x', 'run-1', '$root/nope')").collect())
    assert(e.getMessage.contains("does not pin"))
    // the audit listing: one row per (tag, table) with the pinned cut
    val listed = spark.sql(s"SELECT * FROM graft_tags('$x') ORDER BY table_dir")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(listed == Seq(("run-1", m, 1L), ("run-1", t, 1L)), s"got $listed")
  }

  test("non-literal or malformed arguments fail loud at analysis") {
    val t = fresh("bad")
    TxLog.commit(spark, t, data(0L, 10L))
    intercept[Exception](
      spark.sql(s"SELECT * FROM graft_snapshot('$t', 1, 2, 3)").collect())
    intercept[Exception](
      spark.sql("SELECT * FROM graft_changes('/nope/missing', 1, 2)").collect())
    intercept[Exception](
      spark.sql(s"SELECT * FROM graft_snapshot(42)").collect())
  }
}
