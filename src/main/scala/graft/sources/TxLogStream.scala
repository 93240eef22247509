package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Structured Streaming SOURCE over a [[TxLog]] table — the read-side
  * complement of [[TxLog.commitStreaming]] (the exactly-once sink):
  * `spark.readStream.format("txlog").load(dir)` turns the commit log
  * itself into the stream, the way Delta/Iceberg expose "table as a
  * stream of appends" (reference behavior: the reference's consumers
  * poll published snapshot versions; here the manifest IS the
  * subscription).
  *
  * Offsets are manifest VERSIONS. Each micro-batch is the set of batch
  * dirs ADDED between two committed versions (`TxLog.versionDelta` —
  * two KB-sized manifest reads, never a directory listing), read back
  * through the ordinary parquet relation so column pruning and filter
  * pushdown apply to streamed batches exactly as to batch scans.
  * Exactly-once follows from determinism: the checkpoint stores the
  * version interval, and replaying `getBatch(v1, v2)` always yields the
  * same immutable dirs. The initial batch (no start offset) is the
  * whole current snapshot, so `stream ≡ batch` from the first trigger.
  *
  * Non-append commits (deleteWhere / merge / compact / overwrite REMOVE
  * dirs) break append-stream semantics; the source fails loudly unless
  * `ignoreChanges=true`, which emits only the added dirs (rewritten
  * rows re-appear — the consumer must be idempotent/keyed, same
  * contract as Delta's `ignoreChanges`).
  *
  * At 100 TB: offset resolution and planning touch ONLY the manifest
  * (O(batches) strings); data I/O is exactly the new files. A
  * continuously-appending table streams with per-trigger cost
  * proportional to the delta, not the table.
  */
class TxLogSource(spark: SparkSession, tableDir: String,
    override val schema: StructType, ignoreChanges: Boolean,
    startingVersion: Long = 0L, changeFeed: Boolean = false)
    extends Source {

  private def ver(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    // after a checkpoint restart offsets arrive re-hydrated from JSON
    case other => other.json.trim.toLong
  }

  override def getOffset: Option[Offset] = {
    val v = TxLog.latestVersion(spark, tableDir)
    if (v <= 0) None else Some(LongOffset(v))
  }

  private def emptyBatch: DataFrame =
    SqlBridge.ofRows(spark, LocalRelation(
      org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema),
      Seq.empty, isStreaming = true))

  /** CHANGE-FEED mode (`changeFeed=true`): each micro-batch is
    * `TxLog.changeFeed(fromV, toV)` — tagged insert/delete rows instead
    * of raw appends, so DELETES AND REWRITES STREAM instead of failing
    * the append contract: the CDC consumer (`Cdc.applyChanges`,
    * `maintainAggView`'s signed fold) sees row removals as first-class
    * events. Exactly-once holds the same way: the feed over an
    * immutable version interval is deterministic, so a checkpoint
    * replay rebuilds the identical batch. The plan is composed (unions
    * / exceptAll over the touched dirs), so it streams through a
    * lazily-planned RDD leaf rather than a re-tagged file relation.
    */
  private def feedBatch(fromV: Long, toV: Long): DataFrame = {
    if (toV <= fromV) return emptyBatch
    import org.apache.spark.sql.functions.{col, lit}
    // Null-fill, never bare-select (round-9 ADVICE): the feed's schema
    // is only the union of the interval's TOUCHED batch schemas, and
    // the append type guard permits appends that omit evolved columns —
    // a micro-batch whose touched batches lack one would otherwise
    // throw and kill the streaming query. Mirrors the append path's
    // explicit-schema read, which null-fills through the parquet reader.
    val raw = TxLog.changeFeed(spark, tableDir, fromV, toV)
    val have = raw.columns.toSet
    val feed = raw.select(schema.fields.toSeq.map { f =>
      if (have(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
    SqlBridge.internalCreateStreamingDataFrame(spark,
      feed.queryExecution.toRdd, schema)
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    if (changeFeed)
      return feedBatch(start.map(ver).getOrElse(startingVersion), ver(end))
    // no checkpointed start: begin after `startingVersion` (0 = the
    // whole snapshot is the initial batch; "latest" resolved at source
    // creation = tail-only). Restarts always carry a checkpoint offset,
    // so this affects only the stream's FIRST interval.
    val fromV = start.map(ver).getOrElse(startingVersion)
    val toV = ver(end)
    val (added, removed) = TxLog.versionDelta(spark, tableDir, fromV, toV)
    // a deletion vector changes a batch's LINE in place (same dir set,
    // different rows) -- an append-only consumer must treat that like a
    // rewrite; and an ADDED dir whose line carries a vector (a DV table
    // streamed from its initial snapshot) cannot stream raw at all: the
    // scan would resurrect tombstoned rows
    val changed = TxLog.versionChangedShared(spark, tableDir, fromV, toV)
    if (changed.nonEmpty && !ignoreChanges)
      throw new IllegalStateException(
        s"txlog stream $tableDir: versions ($fromV, $toV] changed " +
          s"${changed.size} committed batch line(s) in place (deletion " +
          "vectors). An append stream cannot represent row removals; " +
          "re-derive the consumer, or set ignoreChanges=true to keep " +
          "streaming added dirs only.")
    if (removed.nonEmpty && !ignoreChanges)
      throw new IllegalStateException(
        s"txlog stream $tableDir: versions ($fromV, $toV] removed " +
          s"${removed.size} batch dir(s) (delete/merge/compact/overwrite). " +
          "An append stream cannot represent removals; re-derive the " +
          "consumer, or set ignoreChanges=true to stream only added dirs " +
          "(rewritten rows re-appear; consumer must be keyed/idempotent).")
    if (added.isEmpty)
      // zero-delta interval (e.g. a RESTORE republishing the same dirs)
      emptyBatch
    else {
      // ordinary parquet relation over exactly the added dirs, re-tagged
      // as streaming (the same move FileStreamSource makes): pruning and
      // pushdown work on streamed batches like on any scan
      val batch = spark.read.schema(schema).parquet(added: _*)
      val streamed = batch.queryExecution.analyzed match {
        case l: LogicalRelation => SqlBridge.ofRows(spark, l.copy(isStreaming = true))
        case other => throw new IllegalStateException(
          s"txlog stream: unexpected batch plan ${other.getClass.getName}")
      }
      // an ADDED dir whose line carries a deletion vector (a vectored
      // table streamed from its initial snapshot, or a batch committed
      // AND vectored within one interval) streams its LIVE rows: the
      // vector side is static and KB-sized, so this plans as the
      // supported stream-static left-anti join
      val dvPaths = TxLog.dvPathsForDirs(spark, tableDir, toV, added.toSet)
      if (dvPaths.isEmpty) streamed
      else {
        import org.apache.spark.sql.functions.col
        val dv = spark.read.parquet(dvPaths: _*)
          .select(col("path").as("__dv_p"), col("row_idx").as("__dv_i"))
        streamed
          .withColumn("__dv_path", col("_metadata.file_path"))
          .withColumn("__dv_idx", col("_metadata.row_index"))
          .join(dv, col("__dv_path") === dv("__dv_p") &&
            col("__dv_idx") === dv("__dv_i"), "left_anti")
          .drop("__dv_path", "__dv_idx")
      }
    }
  }

  override def commit(end: Offset): Unit = () // retention is vacuum's job

  override def stop(): Unit = ()

  override def toString: String = s"TxLogSource[$tableDir]"
}

/** `format("txlog")` provider (also registered as a service so the
  * short name resolves), for BOTH sides of the API:
  * `spark.read.format("txlog").load(dir)` resolves the snapshot and
  * registers the table with the optimizer rules (≡ [[TxLog.table]],
  * returning the very `HadoopFsRelation` a parquet scan plans — full
  * pushdown, manifest pruning, metadata aggregates), and
  * `spark.readStream.format("txlog").load(dir)` streams the commit log.
  *
  * Batch options: `versionAsOf` (time travel), `mergeSchema`. Stream
  * options: `ignoreChanges` (default false — see [[TxLogSource]]),
  * `startingVersion` (a version number, or `latest` to stream only
  * commits made after the query starts — the initial snapshot is
  * skipped; default 0 = snapshot-then-deltas), `changeFeed` (default
  * false — stream [[TxLog.changeFeed]]'s tagged insert/delete rows
  * instead of raw appends, so deletes and rewrites flow as CDC events
  * rather than failing the append contract; adds `_change_type` /
  * `_commit_version` columns).
  */
class TxLogSourceProvider extends StreamSourceProvider with RelationProvider
    with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "txlog"

  /** `df.write.format("txlog").mode(...).save(dir)` — the WRITE side of
    * the format: Overwrite/ErrorIfExists/Ignore map to a snapshot
    * commit, Append to an append commit (type guard, stored
    * constraints, optimistic retry — everything [[TxLog.commit]]
    * enforces). Completes the format triple: read, readStream, write.
    */
  override def createRelation(ctx: SQLContext,
      mode: org.apache.spark.sql.SaveMode,
      params: Map[String, String], df: DataFrame): BaseRelation = {
    import org.apache.spark.sql.SaveMode
    val dir = dirOf(params)
    val exists = TxLog.latestVersion(ctx.sparkSession, dir) > 0
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(
          s"txlog table $dir already exists (mode ErrorIfExists)")
      case SaveMode.Ignore if exists => ()
      case m =>
        TxLog.commit(ctx.sparkSession, dir, df,
          append = m == SaveMode.Append)
    }
    // the writer's return value is unused by DataFrameWriter; a bare
    // schema carrier avoids re-resolving the snapshot (which would
    // throw for an append onto a vectored table — a legal write)
    new BaseRelation {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = df.schema
    }
  }

  private def dirOf(params: Map[String, String]): String =
    params.getOrElse("path", throw new IllegalArgumentException(
      "txlog needs a table dir: .option(\"path\", dir) or .load(dir)"))

  override def createRelation(ctx: SQLContext,
      params: Map[String, String]): BaseRelation = {
    val dir = dirOf(params)
    val p = params.map { case (k, v) => k.toLowerCase -> v }
    graft.plans.TxPruneRule.register(dir)
    val tsAsOf = p.get("timestampasof").map(v =>
      v.toLongOption.getOrElse(java.sql.Timestamp.valueOf(v).getTime))
    val asOfV = p.get("versionasof").map(_.toLong)
      .orElse(tsAsOf.map(TxLog.versionAt(ctx.sparkSession, dir, _)))
    if (TxLog.hasDeletionVectors(ctx.sparkSession, dir, asOfV.getOrElse(0L)))
      throw new IllegalStateException(
        s"txlog batch format on $dir: the snapshot carries deletion " +
          "vectors, which a bare file relation cannot represent. Read " +
          "through TxLog.read (applies the vectors) or run " +
          "TxLog.purgeDeletes first.")
    val df = TxLog.read(ctx.sparkSession, dir,
      asOf = asOfV,
      mergeSchema = p.get("mergeschema").exists(_.toBoolean))
    df.queryExecution.analyzed match {
      case l: LogicalRelation => l.relation
      case other => throw new IllegalStateException(
        s"txlog batch read: unexpected plan ${other.getClass.getName}")
    }
  }

  /** The change-feed stream's row shape: the table's columns plus the
    * CDC tags [[TxLog.changeFeed]] attaches.
    */
  private def feedSchema(base: StructType): StructType = base
    .add("_change_type", org.apache.spark.sql.types.StringType)
    .add("_commit_version", org.apache.spark.sql.types.LongType)

  private def wantFeed(params: Map[String, String]): Boolean =
    params.collectFirst { case (k, v) if k.equalsIgnoreCase("changefeed") =>
      v.toBoolean }.getOrElse(false)

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, params: Map[String, String]): (String, StructType) =
    (s"txlog:${dirOf(params)}", schema.getOrElse {
      val base = TxLog.snapshotSchema(ctx.sparkSession, dirOf(params))
      if (wantFeed(params)) feedSchema(base) else base
    })

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      params: Map[String, String]): Source = {
    val dir = dirOf(params)
    val p = params.map { case (k, v) => k.toLowerCase -> v }
    val startV = p.get("startingversion") match {
      case Some("latest") => TxLog.latestVersion(ctx.sparkSession, dir)
      case Some(n) => n.toLong
      case None => 0L
    }
    val feed = p.get("changefeed").exists(_.toBoolean)
    val ignore = p.get("ignorechanges").exists(_.toBoolean)
    require(!(feed && ignore),
      "changeFeed already streams removals as tagged deletes; " +
        "ignoreChanges contradicts it")
    new TxLogSource(ctx.sparkSession, dir,
      schema.getOrElse {
        val base = TxLog.snapshotSchema(ctx.sparkSession, dir)
        if (feed) feedSchema(base) else base
      },
      ignoreChanges = ignore,
      startingVersion = startV, changeFeed = feed)
  }
}
