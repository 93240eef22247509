package graft

import graft.sources.TxLog
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** TxLog as a Structured Streaming SOURCE (`format("txlog")`): offsets
  * are manifest versions, each micro-batch is exactly the dirs a commit
  * added, the initial batch is the whole snapshot, checkpoint restarts
  * are exactly-once, and non-append rewrites fail loudly unless
  * ignoreChanges opts into added-dirs-only semantics.
  */
class TxLogStreamSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def fresh(name: String): String = {
    val dir = s"${GraftSession.scratchBase}/txstream_spec_$name"
    fs.delete(new Path(dir), true)
    dir
  }

  /** Drive the stream over the table, recording each micro-batch's ids,
    * until no data remains; returns the running query for further
    * commits + processAllAvailable rounds.
    */
  private def drive(t: String, cp: String,
      batches: ArrayBuffer[Seq[Long]], ignoreChanges: Boolean = false) = {
    val reader = spark.readStream.format("txlog")
    val src = (if (ignoreChanges) reader.option("ignoreChanges", "true")
               else reader).load(t)
    val q = src.select($"id").writeStream
      .option("checkpointLocation", cp)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = b.as[Long].collect().toSeq.sorted
        if (ids.nonEmpty) batches.synchronized { batches += ids }
        ()
      }
      .start()
    q.processAllAvailable()
    q
  }

  test("initial batch = snapshot; later triggers carry only the delta") {
    val t = fresh("delta")
    val cp = fresh("delta_cp")
    TxLog.commit(spark, t, (0L until 10L).toDF("id"), append = true)
    TxLog.commit(spark, t, (10L until 20L).toDF("id"), append = true)
    val got = ArrayBuffer.empty[Seq[Long]]
    val q = drive(t, cp, got)
    try {
      assert(got.size == 1, s"both existing batches arrive as ONE snapshot: $got")
      assert(got.head == (0L until 20L))
      TxLog.commit(spark, t, (20L until 30L).toDF("id"), append = true)
      q.processAllAvailable()
      assert(got.size == 2 && got(1) == (20L until 30L),
        s"only the appended batch streams: $got")
      // two quick appends: the engine may cut one version interval or
      // two (it polls concurrently) — either way the union is exact and
      // nothing replays
      TxLog.commit(spark, t, (30L until 35L).toDF("id"), append = true)
      TxLog.commit(spark, t, (35L until 40L).toDF("id"), append = true)
      q.processAllAvailable()
      assert(got.drop(2).flatten.sorted == (30L until 40L), s"got $got")
    } finally q.stop()
  }

  test("checkpoint restart resumes exactly-once (no replay, no loss)") {
    val t = fresh("restart")
    val cp = fresh("restart_cp")
    TxLog.commit(spark, t, (0L until 8L).toDF("id"), append = true)
    val got = ArrayBuffer.empty[Seq[Long]]
    val q1 = drive(t, cp, got)
    q1.stop()
    assert(got.size == 1 && got.head == (0L until 8L))
    // committed while the stream is DOWN
    TxLog.commit(spark, t, (8L until 12L).toDF("id"), append = true)
    val q2 = drive(t, cp, got)
    try {
      assert(got.size == 2 && got(1) == (8L until 12L),
        s"restart must deliver exactly the missed delta: $got")
    } finally q2.stop()
  }

  test("non-append rewrite fails the stream; ignoreChanges streams added dirs") {
    val t = fresh("rewrite")
    TxLog.commit(spark, t, (0L until 10L).toDF("id"), append = true)
    TxLog.commit(spark, t, (10L until 20L).toDF("id"), append = true)
    val got = ArrayBuffer.empty[Seq[Long]]
    val q = drive(t, fresh("rewrite_cp"), got)
    try {
      // rewrites the batch holding id=5 (removes a dir, adds its rewrite)
      TxLog.deleteWhere(spark, t, "id", Some(5L), Some(5L))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(ex.getCause.getMessage.contains("removed"),
        s"must name the removal: ${ex.getCause.getMessage}")
    } finally q.stop()
    // ignoreChanges: a fresh stream sees the table; a rewrite mid-stream
    // re-emits the rewritten dir's rows (consumer contract: keyed)
    val got2 = ArrayBuffer.empty[Seq[Long]]
    val q2 = drive(t, fresh("rewrite_cp2"), got2, ignoreChanges = true)
    try {
      assert(got2.head.size == 19) // id=5 deleted above
      TxLog.deleteWhere(spark, t, "id", Some(15L), Some(15L))
      q2.processAllAvailable()
      // the rewritten batch re-appears minus the deleted row
      assert(got2.size == 2 && got2(1).size == 9 && !got2(1).contains(15L))
    } finally q2.stop()
  }

  test("startingVersion=latest skips the snapshot, streams only new commits") {
    val t = fresh("tail")
    TxLog.commit(spark, t, (0L until 50L).toDF("id"), append = true)
    TxLog.commit(spark, t, (50L until 80L).toDF("id"), append = true)
    val got = ArrayBuffer.empty[Seq[Long]]
    val q = spark.readStream.format("txlog")
      .option("startingVersion", "latest").load(t)
      .select($"id").writeStream
      .option("checkpointLocation", fresh("tail_cp"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = b.as[Long].collect().toSeq.sorted
        if (ids.nonEmpty) got.synchronized { got += ids }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      assert(got.isEmpty, s"the pre-existing snapshot must NOT stream: $got")
      TxLog.commit(spark, t, (80L until 90L).toDF("id"), append = true)
      q.processAllAvailable()
      assert(got.flatten.sorted == (80L until 90L), s"only the tail: $got")
    } finally q.stop()
  }

  test("a STREAMING aggregate over a registered table is never metadata-substituted") {
    val t = fresh("streamagg")
    TxLog.commit(spark, t, (0L until 10L).toDF("id"), append = true)
    // registering the dir arms TxAggRule for batch plans of t — the
    // rule must still leave the STREAMING micro-batch scans alone, or
    // the stateful count below would double-count / crash
    graft.plans.TxPruneRule.register(t)
    val q = spark.readStream.format("txlog").load(t)
      .groupBy().count()
      .writeStream.outputMode("complete")
      .format("memory").queryName("txagg_stream_guard")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("txagg_stream_guard").as[Long].collect().toSeq
        == Seq(10L))
      TxLog.commit(spark, t, (10L until 14L).toDF("id"), append = true)
      q.processAllAvailable()
      assert(spark.table("txagg_stream_guard").as[Long].collect().toSeq
        == Seq(14L), "running count must accumulate across micro-batches")
    } finally q.stop()
  }

  test("batch format(\"txlog\") reads snapshots, time travel, and composes with the rules") {
    val t = fresh("batchfmt")
    TxLog.commit(spark, t, (0L until 10L).toDF("id"), append = true)
    val v1 = TxLog.latestVersion(spark, t)
    TxLog.commit(spark, t, (10L until 20L).toDF("id"), append = true)
    val df = spark.read.format("txlog").load(t)
    assert(df.as[Long].collect().sorted.toSeq == (0L until 20L))
    // time travel
    assert(spark.read.format("txlog").option("versionAsOf", v1.toString)
      .load(t).count() == 10L)
    // the load REGISTERED the table: an ordinary filter prunes at the
    // manifest, and a global count answers scan-free
    val hi = spark.read.format("txlog").load(t).filter($"id" >= 15L)
    assert(hi.inputFiles.map(f => new Path(f).getParent.getName)
      .toSet.size == 1, "manifest pruning must fire through the format")
    val cnt = spark.read.format("txlog").load(t).groupBy().count()
    assert(cnt.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }.isEmpty, "metadata count must fire through the format")
    assert(cnt.collect().head.getLong(0) == 20L)
  }

  test("SQL DDL surface: CREATE TEMPORARY VIEW ... USING txlog, incl. time travel") {
    val t = fresh("sqlddl")
    TxLog.commit(spark, t, (0L until 10L).toDF("id"), append = true)
    val v1 = TxLog.latestVersion(spark, t)
    TxLog.commit(spark, t, (10L until 30L).toDF("id"), append = true)
    try {
      // pure-SQL consumers reach the lakehouse through the standard
      // USING clause — no Scala API in sight
      spark.sql(
        s"CREATE OR REPLACE TEMPORARY VIEW tx_sql USING txlog OPTIONS (path '$t')")
      assert(spark.sql("SELECT count(*) AS n FROM tx_sql").head().getLong(0) == 30L)
      assert(spark.sql("SELECT sum(id) AS s FROM tx_sql WHERE id >= 25")
        .head().getLong(0) == (25L until 30L).sum)
      spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW tx_sql_v1 USING txlog " +
        s"OPTIONS (path '$t', versionAsOf '$v1')")
      assert(spark.sql("SELECT count(*) FROM tx_sql_v1").head().getLong(0) == 10L)
      // the relation behind the view is the registered parquet scan, so
      // manifest pruning fires on ordinary SQL filters too
      val pruned = spark.sql("SELECT * FROM tx_sql WHERE id >= 25")
      assert(pruned.inputFiles.map(f => new Path(f).getParent.getName)
        .toSet.size == 1, "manifest pruning must fire through SQL DDL")
    } finally {
      spark.sql("DROP VIEW IF EXISTS tx_sql")
      spark.sql("DROP VIEW IF EXISTS tx_sql_v1")
    }
  }

  test("stream total equals batch read after many appends (stream ≡ batch)") {
    val t = fresh("equiv")
    (0 until 5).foreach { i =>
      TxLog.commit(spark, t, (i * 7L until (i + 1) * 7L).toDF("id"),
        append = true)
    }
    val got = ArrayBuffer.empty[Seq[Long]]
    val q = drive(t, fresh("equiv_cp"), got)
    try {
      assert(got.flatten.sorted == TxLog.read(spark, t)
        .as[Long].collect().toSeq.sorted)
    } finally q.stop()
  }

  /** Drive a changeFeed-mode stream, recording (_change_type, id,
    * _commit_version) triples.
    */
  private def driveFeed(t: String, cp: String,
      rows: ArrayBuffer[(String, Long, Long)]) = {
    val q = spark.readStream.format("txlog")
      .option("changeFeed", "true").load(t)
      .writeStream.option("checkpointLocation", cp)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val r = b.collect().map(x => (x.getAs[String]("_change_type"),
          x.getAs[Long]("id"), x.getAs[Long]("_commit_version")))
        if (r.nonEmpty) rows.synchronized { rows ++= r }
        ()
      }
      .start()
    q.processAllAvailable()
    q
  }

  test("changeFeed stream: deletes and rewrites arrive as tagged CDC rows") {
    val t = fresh("cdf")
    TxLog.commit(spark, t, (0L until 10L).toDF("id"))
    val got = ArrayBuffer.empty[(String, Long, Long)]
    val q = driveFeed(t, fresh("cdf_cp"), got)
    try {
      // initial batch: the snapshot as v1 inserts
      assert(got.size == 10 && got.forall(r => r._1 == "insert" && r._3 == 1L))
      TxLog.commit(spark, t, (10L until 15L).toDF("id"), append = true)
      q.processAllAvailable()
      assert(got.count(_._3 == 2L) == 5)
      // the DV delete that FAILS the append stream flows here as
      // tagged delete rows — the whole point of the mode
      TxLog.deleteVectored(spark, t, "id", Some(3L), Some(5L))
      q.processAllAvailable()
      val dels = got.synchronized(got.filter(_._1 == "delete")).sortBy(_._2)
      assert(dels.map(_._2) == Seq(3L, 4L, 5L) && dels.forall(_._3 == 3L))
      // physical reorganization stays silent in feed mode too
      TxLog.purgeDeletes(spark, t)
      q.processAllAvailable()
      assert(got.size == 18, s"purge must add nothing: $got")
    } finally q.stop()
  }

  test("changeFeed stream survives appends that omit evolved columns (r9 ADVICE)") {
    val t = fresh("cdf_evolve")
    TxLog.commit(spark, t, (0L until 4L).toDF("id"))
    // schema evolution: v2 adds `tag`
    TxLog.commit(spark, t, spark.range(4L, 6L)
      .select(col("id"), lit("x").as("tag")), append = true)
    val got = ArrayBuffer.empty[(Long, Long, Option[String])]
    val q = spark.readStream.format("txlog")
      .option("changeFeed", "true").load(t)
      .writeStream.option("checkpointLocation", fresh("cdf_evolve_cp"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val r = b.collect().map(x => (x.getAs[Long]("id"),
          x.getAs[Long]("_commit_version"), Option(x.getAs[String]("tag"))))
        if (r.nonEmpty) got.synchronized { got ++= r }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      assert(got.size == 6)
      // post-evolution append WITHOUT the evolved column (the append
      // guard permits omission): this micro-batch's feed carries only
      // the touched batch's columns — the source must null-fill `tag`,
      // not throw AnalysisException and kill the query
      TxLog.commit(spark, t, (6L until 9L).toDF("id"), append = true)
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"stream died: ${q.exception}")
      val v3 = got.synchronized(got.filter(_._2 == 3L))
      assert(v3.map(_._1).sorted == Seq(6L, 7L, 8L))
      assert(v3.forall(_._3.isEmpty), "omitted evolved column must null-fill")
    } finally q.stop()
  }

  test("changeFeed checkpoint restart resumes exactly-once") {
    val t = fresh("cdf_restart")
    val cp = fresh("cdf_restart_cp")
    TxLog.commit(spark, t, (0L until 6L).toDF("id"))
    val got = ArrayBuffer.empty[(String, Long, Long)]
    val q1 = driveFeed(t, cp, got)
    q1.stop()
    assert(got.size == 6)
    // changes land while the stream is down; the restart folds exactly
    // them — no replay of v1, no loss
    TxLog.commit(spark, t, (6L until 9L).toDF("id"), append = true)
    TxLog.deleteVectored(spark, t, "id", Some(0L), Some(0L))
    got.clear()
    val q2 = driveFeed(t, cp, got)
    try {
      val byKind = got.synchronized(got.toList).groupBy(_._1)
      assert(byKind("insert").map(_._2).sorted == Seq(6L, 7L, 8L))
      assert(byKind("delete").map(_._2) == Seq(0L))
    } finally q2.stop()
  }
}
