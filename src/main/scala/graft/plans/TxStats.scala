package graft.plans

import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogStatistics, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.logical.statsEstimation.EstimationUtils
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Manifest statistics → Catalyst `Statistics` for registered TxLog
  * scans — the engine's CBO feed.
  *
  * Without this, join planning sizes a parquet scan by its FILE BYTES
  * (`HadoopFsRelation.sizeInBytes`), and zstd text compresses so hard
  * that a multi-GB-in-memory frame can look broadcastable — the
  * driver-OOM failure mode the operator-level `hint("merge")` pins
  * exist to prevent. The TxLog manifest already holds the EXACT footer
  * row count of every batch (harvested free at commit; tombstones NOT
  * subtracted — they don't apply to asOf scans of the same dirs, and
  * over-estimating is the safe direction for broadcast decisions);
  * this rule reports it through the relation as
  * `CatalogStatistics(rowCount, rowCount × schema-derived row width)`,
  * so broadcast-vs-merge flips on real cardinalities at any scale —
  * the planner makes the decision the pins hand-made, from data. The
  * index-backed retrieval paths ([[graft.operators.TextRetrieval
  * .bm25TopKIndexed]], [[graft.operators.Similarity.ivfTopKIndexed]])
  * carry NO join hints for exactly this reason.
  *
  * Soundness / scope:
  *  - fires only on scans whose EVERY root path is a batch dir of a
  *    registered table's LATEST manifest (full snapshot reads and any
  *    manifest-pruned subset — per-dir row counts are immutable facts,
  *    so summing the scanned subset is exact; an unknown dir, e.g. a
  *    time-travel read of a vacuumed-away version, reports nothing);
  *  - attaches ONLY statistics (a synthetic `CatalogTable` whose
  *    `stats` field `LogicalRelation.computeStats` consults); the
  *    relation, output attributes and file index are untouched, so
  *    results cannot change — only plan choice;
  *  - scans that already carry a catalog table are left alone;
  *  - size = rowCount × `EstimationUtils.getSizePerRow(output)` — the
  *    same width model Catalyst uses everywhere above the scan, i.e.
  *    the IN-MEMORY size joins actually pay, not the compressed bytes;
  *  - legacy manifests without row counts contribute nothing (fall
  *    back to file-size estimation rather than guess).
  */
object TxStatsRule extends Rule[LogicalPlan] {

  /** STATS-ONLY registrations: tables that want manifest row counts in
    * the planner WITHOUT enrolling in TxPrune/DynPrune (whose
    * planning-time work — and DynPrune's dim-side EXECUTION — is wasted
    * on scans the caller already manifest-pruned, e.g. the committed
    * retrieval indexes). `TxLog.table` registrations (TxPruneRule's
    * set) get stats too.
    */
  private val statsTables =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def register(tableDir: String): Unit =
    statsTables.add(TxPruneRule.norm(tableDir))

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!TxPruneRule.anyRegistered && statsTables.isEmpty) plan
    else plan.transformUp {
      case l: LogicalRelation if l.catalogTable.isEmpty =>
        withStats(l).getOrElse(l)
    }

  private def withStats(l: LogicalRelation): Option[LogicalRelation] = {
    val fsRel = l.relation match {
      case h: HadoopFsRelation if h.partitionSchema.isEmpty => h
      case _ => return None
    }
    val roots = fsRel.location.rootPaths.map(p => TxPruneRule.norm(p.toString))
    if (roots.isEmpty) return None
    val tableDir = TxPruneRule.registeredDirOf(roots)
      .orElse(TxPruneRule.dirOf(roots).filter(statsTables.contains))
      .getOrElse(return None)
    val spark = fsRel.sparkSession
    val byDir = graft.sources.TxLog.liveRowsByDir(spark, tableDir)
      .getOrElse(return None)
    val abs = byDir.map { case (d, n) => TxPruneRule.norm(s"$tableDir/$d") -> n }
    var rows = BigInt(0)
    roots.foreach(r => rows += abs.getOrElse(r, return None))
    val size = (rows * EstimationUtils.getSizePerRow(l.output)).max(BigInt(1))
    val ct = CatalogTable(
      identifier = TableIdentifier("txlog_manifest_stats"),
      tableType = CatalogTableType.EXTERNAL,
      storage = CatalogStorageFormat.empty,
      schema = l.schema,
      provider = Some("parquet"),
      stats = Some(CatalogStatistics(size, Some(rows))))
    Some(l.copy(catalogTable = Some(ct)))
  }
}
