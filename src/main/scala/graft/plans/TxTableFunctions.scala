package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL table-valued functions over the lakehouse — the Delta-style
  * pure-SQL consumer surface (`SELECT * FROM table_changes(...)`),
  * registered through [[graft.GraftExtensions]]'s
  * `injectTableFunction`:
  *
  * {{{
  *   SELECT * FROM graft_snapshot('/table')            -- latest
  *   SELECT * FROM graft_snapshot('/table', 3)         -- time travel
  *   SELECT * FROM graft_changes('/table', 1, 5)       -- CDC read
  *   SELECT * FROM graft_history('/table')             -- commit log
  * }}}
  *
  * An analyst with only SQL gets the full engine: the builders run at
  * ANALYSIS time and splice in the very plans the Scala API builds, so
  * manifest pruning (the snapshot registers with [[TxPruneRule]] like
  * `TxLog.table`), DV anti-joins, metadata aggregates, and the
  * checkpoint-classified change feed all ride along. Arguments must be
  * literals — they name a table and a version, resolution-time facts
  * by nature; anything else fails loud at analysis.
  */
object TxTableFunctions {

  private def str(e: Expression, fn: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal string table dir, got $other")
  }

  private def lng(e: Expression, fn: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer version, got $other")
  }

  /** `graft_snapshot(dir [, version])`: the committed snapshot as a
    * table — latest (registered for manifest pruning, ≡ `TxLog.table`)
    * or pinned time travel.
    */
  def snapshot(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.nonEmpty && exprs.size <= 2,
      s"graft_snapshot(dir [, version]) got ${exprs.size} args")
    val spark = SparkSession.active
    val dir = str(exprs.head, "graft_snapshot")
    val df = exprs.lift(1).map(lng(_, "graft_snapshot")) match {
      // pinned snapshots skip rule registration: TxPruneRule maps the
      // LATEST manifest, and pruning an older snapshot's scan with it
      // could drop batches that version still references
      case Some(v) => graft.sources.TxLog.read(spark, dir, asOf = Some(v))
      case None => graft.sources.TxLog.table(spark, dir)
    }
    df.queryExecution.analyzed
  }

  /** `graft_changes(dir, fromV, toV)`: tagged insert/delete rows —
    * `TxLog.changeFeed` for SQL consumers (Delta's `table_changes`).
    */
  def changes(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 3,
      s"graft_changes(dir, fromVersion, toVersion) got ${exprs.size} args")
    val spark = SparkSession.active
    graft.sources.TxLog.changeFeed(spark,
      str(exprs.head, "graft_changes"),
      lng(exprs(1), "graft_changes"),
      lng(exprs(2), "graft_changes"))
      .queryExecution.analyzed
  }

  /** `graft_history(dir)`: the commit log — (version, timestamp_ms,
    * operation, num_batches) per committed version, newest first.
    */
  def history(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 1, s"graft_history(dir) got ${exprs.size} args")
    val spark = SparkSession.active
    graft.sources.TxLog.history(spark, str(exprs.head, "graft_history"))
      .queryExecution.analyzed
  }

  /** `graft_consumers(dir)`: the CDC consumer registry — (consumer,
    * acked_version, lag) rows, lag relative to the current latest. The
    * retention-runbook query: `SELECT * FROM graft_consumers(t) WHERE
    * acked_version < <retainFrom>` names exactly who a planned vacuum
    * would break.
    */
  def consumers(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 1, s"graft_consumers(dir) got ${exprs.size} args")
    val spark = SparkSession.active
    val dir = str(exprs.head, "graft_consumers")
    val latest = graft.sources.TxLog.latestVersion(spark, dir)
    import spark.implicits._
    graft.sources.TxLog.consumerAcks(spark, dir).toSeq.sorted
      .map { case (n, v) => (n, v, latest - v) }
      .toDF("consumer", "acked_version", "lag")
      .queryExecution.analyzed
  }

  /** `graft_consistent(txnDir, dir)`: one table of the cross-table
    * consistent cut — [[graft.sources.TxLog.readConsistent]] for SQL
    * consumers. A pending multi-table transaction that is only
    * partially published is invisible through this read on EVERY
    * participating table, so joins across the cut never see the torn
    * middle.
    */
  def consistent(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 2,
      s"graft_consistent(txnDir, dir) got ${exprs.size} args")
    val spark = SparkSession.active
    val txnDir = str(exprs.head, "graft_consistent")
    val dir = str(exprs(1), "graft_consistent")
    graft.sources.TxLog.readConsistent(spark, txnDir, Seq(dir))(dir)
      .queryExecution.analyzed
  }

  /** `graft_tags(txnDir)`: every live tag and its pinned cut, one row
    * per (tag, table) — the audit listing behind "which snapshots exist
    * and what exactly do they pin", pure SQL.
    */
  def tagsList(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 1, s"graft_tags(txnDir) got ${exprs.size} args")
    val spark = SparkSession.active
    val txnDir = str(exprs.head, "graft_tags")
    import spark.implicits._
    graft.sources.TxLog.tags(spark, txnDir)
      .flatMap { name =>
        graft.sources.TxLog.tagVersions(spark, txnDir, name)
          .toSeq.sortBy(_._1).map { case (t, v) => (name, t, v) }
      }
      .toDF("tag", "table_dir", "version")
      .queryExecution.analyzed
  }

  /** `graft_tag(txnDir, tag, dir)`: one table of a NAMED cross-table
    * snapshot at exactly its pinned version — the SQL face of
    * [[graft.sources.TxLog.readTag]], for "reproduce what run X read"
    * audits without the Scala API.
    */
  def tagRead(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 3,
      s"graft_tag(txnDir, tag, dir) got ${exprs.size} args")
    val spark = SparkSession.active
    val txnDir = str(exprs.head, "graft_tag")
    val name = str(exprs(1), "graft_tag")
    val dir = str(exprs(2), "graft_tag")
    val cut = graft.sources.TxLog.tagVersions(spark, txnDir, name)
    val v = cut.getOrElse(dir, throw new IllegalArgumentException(
      s"tag '$name' does not pin $dir (it pins: ${cut.keys.toSeq.sorted.mkString(", ")})"))
    graft.sources.TxLog.read(spark, dir, asOf = Some(v))
      .queryExecution.analyzed
  }
}
