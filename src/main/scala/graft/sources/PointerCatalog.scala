package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** The "pointer database" (S10): a small persisted catalog file mapping
  * table names to published tree locations, which consumers load to get
  * queryable views — the Spark form of the reference's DuckDB catalog of
  * views over R2 file lists (/root/reference/data/src/utils/duckdb.py:
  * 40-84, shipped to consumers via create_public_site.py:118-146).
  *
  * Unlike the reference's pointer DB — which enumerates every parquet
  * file inside the view, so consumers cannot partition-prune — these
  * views resolve through Spark's file index and keep pruning (SURVEY
  * §3.3).
  *
  * Format: one `name<TAB>path` per line (no JSON library needed).
  */
object PointerCatalog {

  def save(catalogFile: String, tables: Map[String, String]): Unit = {
    val lines = tables.toSeq.sorted.map { case (n, p) => s"$n\t$p" }
    val path = Paths.get(catalogFile)
    Option(path.getParent).foreach(Files.createDirectories(_))
    Files.write(path, lines.asJava,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  def load(catalogFile: String): Map[String, String] =
    Files.readAllLines(Paths.get(catalogFile)).asScala
      .filter(_.nonEmpty)
      .map { l => val Array(n, p) = l.split("\t", 2); n -> p }
      .toMap

  /** Load + register: after this, `spark.sql("SELECT ... FROM <name>")`
    * works with partition pruning intact.
    */
  def attach(spark: SparkSession, catalogFile: String): Map[String, String] = {
    val tables = load(catalogFile)
    tables.foreach { case (name, dir) => TableIO.registerView(spark, name, dir) }
    tables
  }

  // ------------------------------------------------------------------
  // Persisted catalog: DDL artifact + real catalog tables.
  //
  // The temp-view attach above is session-scoped. The reference's pointer
  // DB is an *artifact* consumers download and attach cold
  // (/root/reference/data/src/utils/duckdb.py:40-84, shipped by
  // create_public_site.py:118-146). The Spark form of that artifact is a
  // DDL script: plain `CREATE TABLE ... USING parquet LOCATION` +
  // `RECOVER PARTITIONS` statements that ANY new session — different JVM,
  // different cluster — executes to get real metastore entries with
  // per-partition metadata (so pruning happens in the catalog, before
  // file listing, and `ANALYZE TABLE` stats survive with the entry).
  // Nothing in the artifact is session-bound: it is text plus the
  // published tree's location.

  /** Write the DDL artifact for `tables` (name → published tree). */
  def saveDdl(catalogFile: String, tables: Map[String, String]): Unit = {
    def q(s: String) = s.replace("'", "''")
    val stmts = tables.toSeq.sorted.flatMap { case (name, dir) =>
      Seq(
        s"CREATE TABLE IF NOT EXISTS $name USING parquet LOCATION '${q(dir)}'",
        s"ALTER TABLE $name RECOVER PARTITIONS")
    }
    val path = Paths.get(catalogFile)
    Option(path.getParent).foreach(Files.createDirectories(_))
    Files.write(path, stmts.map(_ + ";").asJava,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  /** Execute a DDL artifact: the cold-attach path. Idempotent
    * (CREATE IF NOT EXISTS + RECOVER re-syncs partitions).
    */
  def attachDdl(spark: SparkSession, catalogFile: String): Unit =
    Files.readAllLines(Paths.get(catalogFile)).asScala
      .map(_.trim.stripSuffix(";"))
      .filter(_.nonEmpty)
      .foreach(spark.sql(_))

  /** Cross-engine artifact — the reference's ACTUAL consumer format: a
    * DuckDB SQL script of views over the published trees, so a consumer
    * with no Spark at all gets the same tables
    * (`duckdb times.duckdb -c ".read catalog_views.sql"`, or built into
    * a `.duckdb` database and ATTACHed — the shape of
    * /root/reference/data/src/utils/duckdb.py:40-84, shipped by
    * create_public_site.py:118-146). `hive_partitioning` recovers the
    * partition keys from the directory structure, and DuckDB's glob +
    * hive filter pushdown keeps partition pruning — pointing at the
    * TREE, not an enumerated file list, is what preserves it (SURVEY
    * §3.3).
    */
  def saveDuckDbViews(catalogFile: String, tables: Map[String, String]): Unit = {
    def q(s: String) = s.replace("'", "''")
    val stmts = tables.toSeq.sorted.map { case (name, dir) =>
      // hive_types_autocast = false pins partition keys to VARCHAR: the
      // reference's keys are strings by contract ('01' must keep its
      // zero — create_public_files.py:79), and DuckDB's default autocast
      // would read state=01 back as BIGINT 1
      s"CREATE OR REPLACE VIEW $name AS SELECT * FROM read_parquet(" +
        s"'${q(dir)}/**/*.parquet', hive_partitioning = true, " +
        "hive_types_autocast = false);"
    }
    val path = Paths.get(catalogFile)
    Option(path.getParent).foreach(Files.createDirectories(_))
    Files.write(path, stmts.asJava,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  /** The SELECT body of one engine-free DuckDB view over a [[TxLog]]
    * snapshot (round-9 verdict #6 — the reference's "attach the pointer
    * DB, no pipeline software needed" contract extended to lakehouse
    * tables, index tables included). The view enumerates the snapshot's
    * BATCH-DIR globs from the manifest — never the table tree, which
    * holds dead batches of other versions — so a consumer with only
    * DuckDB reads exactly the committed snapshot. A DV-vectored
    * snapshot emits the tombstone ANTI-JOIN: DuckDB's `filename` /
    * `file_row_number` are the same (file, row) coordinates the vector
    * stores (scheme-stripped on both sides — Spark records a URI,
    * DuckDB a plain path). `union_by_name` keeps schema-evolved
    * snapshots readable. The artifact is a STATIC text snapshot: batch
    * dirs are immutable, so the view stays correct forever for the
    * version it names (it simply goes stale as the table advances —
    * regenerate on publish, like the reference's site exports).
    */
  def duckDbTxSelect(spark: SparkSession, tableDir: String,
      asOf: Option[Long] = None): String = {
    def q(s: String) = s.replace("'", "''")
    val entries = TxLog.manifest(spark, tableDir, asOf)
    val dataGlobs = entries
      .map { case (d, _) => s"'${q(s"$tableDir/$d")}/*.parquet'" }
      .sorted.mkString("[", ", ", "]")
    val dvGlobs = entries.flatMap { case (_, st) => TxLog.dvOf(st) }
      .map { case (rel, _) => s"'${q(s"$tableDir/$rel")}/*.parquet'" }
      .distinct.sorted
    if (dvGlobs.isEmpty)
      s"SELECT * FROM read_parquet($dataGlobs, union_by_name = true)"
    else {
      val dvList = dvGlobs.mkString("[", ", ", "]")
      "SELECT * EXCLUDE (filename, file_row_number) FROM read_parquet(" +
        s"$dataGlobs, union_by_name = true, filename = true, " +
        "file_row_number = true) d WHERE NOT EXISTS (SELECT 1 FROM " +
        s"read_parquet($dvList) v WHERE " +
        // normalize '<scheme>:/...' (Spark URIs: file:/, s3a://) and
        // bare '/...' (DuckDB filenames) to the same slash-less form
        "regexp_replace(v.path, '^([a-z0-9]+:)?/+', '') = " +
        "regexp_replace(d.filename, '^([a-z0-9]+:)?/+', '') " +
        "AND v.row_idx = d.file_row_number)"
    }
  }

  /** [[saveDuckDbViews]] for TxLog tables: one `CREATE OR REPLACE VIEW`
    * per entry, each body from [[duckDbTxSelect]] — vectored snapshots
    * included (the tombstone anti-join rides in the view). `asOf` pins
    * named tables to a version (time travel in the artifact).
    */
  def saveDuckDbTxViews(spark: SparkSession, catalogFile: String,
      tables: Map[String, String],
      asOf: Map[String, Long] = Map.empty): Unit = {
    val stmts = tables.toSeq.sorted.map { case (name, dir) =>
      s"CREATE OR REPLACE VIEW $name AS " +
        duckDbTxSelect(spark, dir, asOf.get(name)) + ";"
    }
    val path = Paths.get(catalogFile)
    Option(path.getParent).foreach(Files.createDirectories(_))
    Files.write(path, stmts.asJava,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }
}
