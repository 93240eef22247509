package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal transactional table format — the lakehouse commit protocol in
  * its smallest honest form (the pattern under Delta/Iceberg, rebuilt
  * from first principles on plain Hadoop FS semantics):
  *
  *  - data files land under `data/<uuid>/` (never mutated, never
  *    renamed — writers produce, only [[vacuum]] deletes);
  *  - a snapshot is a manifest `_log/v<n>` listing its data directories,
  *    one per line;
  *  - COMMIT = create-exclusive of the next manifest version. Hadoop
  *    `create(path, overwrite=false)` is atomic, so two racing writers
  *    cannot both win a version: the loser re-reads the log and retries
  *    on top of the winner (optimistic concurrency, serialized history);
  *  - READERS resolve one manifest and never see partial state: a
  *    snapshot's files are immutable and vacuum only removes
  *    directories no retained manifest references.
  *
  * Time travel is therefore free — `read(dir, Some(v))` resolves an old
  * manifest. At 100 TB the log stays KB-sized (it lists directories,
  * not files) and commits are one small atomic write regardless of data
  * volume.
  */
object TxLog {

  /** FS resolved PER TABLE PATH, not the default FS: a table living on
    * another scheme (s3a://, or the spec's chaos://) must commit and
    * read through ITS filesystem — `FileSystem.get(conf)` would
    * silently aim every metadata operation at the default FS.
    */
  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(tableDir: String) = new Path(s"$tableDir/_log")

  private def versionOf(p: Path): Option[Long] = {
    val n = p.getName
    if (n.startsWith("v")) n.drop(1).toLongOption else None
  }

  /** Latest committed version, 0 when the table does not exist yet. */
  def latestVersion(spark: SparkSession, tableDir: String): Long = {
    val f = fs(spark, tableDir)
    if (!f.exists(logDir(tableDir))) 0L
    else f.listStatus(logDir(tableDir))
      .flatMap(s => versionOf(s.getPath)).sorted.lastOption.getOrElse(0L)
  }

  private def readManifest(spark: SparkSession, tableDir: String, v: Long): Seq[String] = {
    val in = fs(spark, tableDir).open(new Path(logDir(tableDir), s"v$v"))
    try scala.io.Source.fromInputStream(in).getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Commit `df` as the next version. `append = true` carries the
    * previous snapshot's directories forward; otherwise the new snapshot
    * replaces them (the old files stay on disk for time travel until
    * [[vacuum]]). Returns the committed version.
    */
  def commit(spark: SparkSession, tableDir: String, df: DataFrame,
      append: Boolean = false, maxRetries: Int = 20): Long = {
    val f = fs(spark, tableDir)
    val batch = s"data/${java.util.UUID.randomUUID().toString.take(12)}"
    df.write.parquet(s"$tableDir/$batch")
    var attempt = 0
    while (attempt < maxRetries) {
      val base = latestVersion(spark, tableDir)
      val carried =
        if (append && base > 0) readManifest(spark, tableDir, base) else Nil
      val target = new Path(logDir(tableDir), s"v${base + 1}")
      f.mkdirs(logDir(tableDir))
      // create-exclusive: atomic on a correct Hadoop FS — ONLY the
      // already-exists failure is a lost race. Any failure AFTER create
      // succeeds (manifest write/close) must delete the claimed v-file
      // and rethrow: leaving a truncated manifest as the committed
      // latest version would make readers silently resolve a partial
      // snapshot, and append-mode retries would carry the corrupt
      // directory list forward.
      val created =
        try Some(f.create(target, false))
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException |
              _: java.nio.file.FileAlreadyExistsException =>
            attempt += 1 // lost the race; re-read the winner's log
            None
          case e: java.io.IOException // FSes that signal the race untyped
              if e.getMessage != null &&
                e.getMessage.toLowerCase.contains("already exists") =>
            attempt += 1
            None
        }
      created.foreach { out =>
        try {
          out.write((carried :+ batch).mkString("\n").getBytes("UTF-8"))
          out.close()
        } catch {
          case e: Throwable =>
            try out.close() catch { case _: Throwable => () }
            try f.delete(target, false) catch { case _: Throwable => () }
            throw e
        }
        // committed: any MV registered over this table is now stale
        graft.plans.MvCatalog.invalidateByPath(tableDir)
        return base + 1
      }
    }
    throw new IllegalStateException(
      s"commit to $tableDir lost $maxRetries optimistic rounds")
  }

  /** Snapshot read; `asOf = None` resolves the latest version.
    * `mergeSchema = true` unions the column sets of a snapshot whose
    * appended batches evolved the schema (absent columns read as null)
    * — the additive-evolution contract every table format honors.
    */
  def read(spark: SparkSession, tableDir: String, asOf: Option[Long] = None,
      mergeSchema: Boolean = false): DataFrame = {
    val v = asOf.getOrElse(latestVersion(spark, tableDir))
    require(v > 0, s"no committed version in $tableDir")
    val dirs = readManifest(spark, tableDir, v).map(d => s"$tableDir/$d")
    spark.read.option("mergeSchema", mergeSchema).parquet(dirs: _*)
  }

  /** OPTIMIZE: fold the latest snapshot's directories into one compact
    * write and commit it as a new version. Readers of old snapshots are
    * untouched (their directories survive until [[vacuum]]); the new
    * version reads the same rows from fewer, larger files.
    */
  def compact(spark: SparkSession, tableDir: String, partitions: Int = 1): Long =
    commit(spark, tableDir, read(spark, tableDir).repartition(partitions))

  /** Change data feed between two committed versions: the minimal keyed
    * I/U/D batch (in [[graft.operators.Cdc.applyChanges]]' contract)
    * that turns snapshot `fromV` into snapshot `toV` — so downstream
    * consumers replicate by applying deltas instead of re-reading
    * snapshots. Delegates to [[graft.operators.Cdc.makePatch]]: digests
    * shuffle, payloads join back only for divergent keys.
    */
  def changes(spark: SparkSession, tableDir: String, keyCol: String,
      fromV: Long, toV: Long): DataFrame =
    graft.operators.Cdc.makePatch(
      read(spark, tableDir, Some(fromV)),
      read(spark, tableDir, Some(toV)),
      keyCol, seq = toV.toInt)

  /** Drop data directories referenced by NO manifest ≥ `retainFrom`
    * (and the manifests below it). Readers of retained snapshots are
    * unaffected — their files are never touched.
    */
  def vacuum(spark: SparkSession, tableDir: String, retainFrom: Long): Unit = {
    val f = fs(spark, tableDir)
    val latest = latestVersion(spark, tableDir)
    require(retainFrom <= latest, s"retainFrom $retainFrom > latest $latest")
    val keep = (retainFrom to latest)
      .flatMap(v => readManifest(spark, tableDir, v)).toSet
    val dataRoot = new Path(s"$tableDir/data")
    if (f.exists(dataRoot)) {
      f.listStatus(dataRoot).foreach { s =>
        if (!keep.contains(s"data/${s.getPath.getName}"))
          f.delete(s.getPath, true)
      }
    }
    f.listStatus(logDir(tableDir)).foreach { s =>
      versionOf(s.getPath).foreach(v => if (v < retainFrom) f.delete(s.getPath, false))
    }
  }
}
