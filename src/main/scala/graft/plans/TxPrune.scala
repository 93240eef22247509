package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}

/** AUTOMATIC manifest-level file skipping for TxLog tables — predicate
  * pushdown reaching into the table format, as a Catalyst rule.
  *
  * `TxLog.readWhere` prunes explicitly; this rule makes the same prune
  * fire from ORDINARY query predicates: a `Filter` directly over a scan
  * whose file set is a registered TxLog table's latest snapshot has its
  * comparison conjuncts translated to per-column ranges, the manifest
  * consulted (min/max + committed blooms — `TxLog.pruneSnapshot`, the
  * same selection core `readWhereAll` uses), and the scan's file index
  * swapped for one listing only the surviving batch dirs. The `Filter`
  * stays in place, so results are exact — pruning is a pure I/O win,
  * identical to what Delta/Iceberg do inside their DSv2 scan builders,
  * expressed here at the logical-plan level where the repo's other
  * rewrites (BandJoinRule, MvRewriteRule) live.
  *
  * Soundness:
  *  - only top-level AND conjuncts of shape `col ⋈ literal`
  *    (⋈ ∈ {=, <, <=, >, >=, between-derived) are translated; strict
  *    bounds widen to inclusive (conservative). Everything else —
  *    ORs, expressions over columns, correlated refs — contributes NO
  *    range, which can only keep more batches, never drop a live one;
  *  - the swap happens only when the scan's root paths equal the
  *    table's LATEST manifest set exactly (a time-travel read of an
  *    older version never prunes against the wrong manifest);
  *  - after a swap the root paths are a strict subset, so the equality
  *    gate fails and the rule cannot fire twice (fixed-point safe);
  *  - attribute ids are preserved (the `LogicalRelation` node is
  *    copied, only its `HadoopFsRelation.location` changes), so no
  *    plan above needs rewriting.
  *
  * At 100 TB this is the difference between Spark LISTING every batch
  * dir of the table and listing the touched fraction — per query, with
  * no API change for the analyst writing `WHERE id BETWEEN a AND b`.
  */
object TxPruneRule extends Rule[LogicalPlan] {

  private val tables =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def normalize(p: String): String =
    p.stripPrefix("file:").replaceAll("/+$", "")

  /** Shared with [[TxAggRule]]: path normalization for root-set
    * comparison against manifest dirs.
    */
  private[plans] def norm(p: String): String = normalize(p)

  /** Shared with [[TxAggRule]]: cheap short-circuit when nothing was
    * ever registered.
    */
  private[plans] def anyRegistered: Boolean = !tables.isEmpty

  /** The single table dir these scan roots sit under (all must share
    * one `<dir>/data/` tree; roots pre-normalized with [[norm]]) —
    * membership-agnostic, shared with [[TxStatsRule]]'s own registry.
    */
  private[plans] def dirOf(roots: Seq[String]): Option[String] = {
    val dirs = roots.map { r =>
      val i = r.lastIndexOf("/data/")
      if (i < 0) return None else r.substring(0, i)
    }.toSet
    if (dirs.size == 1) Some(dirs.head) else None
  }

  /** The registered table dir these scan roots belong to, if all of
    * them sit under one registered `<dir>/data/` tree (roots must be
    * pre-normalized with [[norm]]).
    */
  private[plans] def registeredDirOf(roots: Seq[String]): Option[String] =
    dirOf(roots).filter(tables.contains)

  /** Register a TxLog table root for automatic pruning (idempotent;
    * called by `TxLog.table`).
    */
  def register(tableDir: String): Unit = tables.add(normalize(tableDir))

  /** Test hook: forget every registration. */
  def clear(): Unit = tables.clear()

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (tables.isEmpty) plan
    else plan.transformUp {
      case f @ Filter(cond, l: LogicalRelation) =>
        prune(cond, l).map(Filter(cond, _)).getOrElse(f)
    }

  /** Ranges from the filter's top-level AND conjuncts. Non-translatable
    * conjuncts are simply ignored (they only make the residual filter
    * stricter). Literal values come back through the Catalyst→Scala
    * converter so string bounds compare as `String`, not `UTF8String`.
    */
  private def ranges(cond: Expression)
      : Map[String, (Option[Any], Option[Any])] = {
    def toScalaV(lit: Literal): Option[Any] = Option(
      CatalystTypeConverters.convertToScala(lit.value, lit.dataType))
    val out = scala.collection.mutable.HashMap
      .empty[String, (Option[Any], Option[Any])]
    def addLo(c: String, v: Any): Unit = {
      val (lo, hi) = out.getOrElse(c, (None, None))
      // two lower bounds on one column: keep either (both sound); last wins
      out(c) = (Some(v), hi)
      val _ = lo
    }
    def addHi(c: String, v: Any): Unit = {
      val (lo, _) = out.getOrElse(c, (None, None))
      out(c) = (lo, Some(v))
    }
    def walk(e: Expression): Unit = e match {
      case And(a, b) => walk(a); walk(b)
      case GreaterThanOrEqual(a: AttributeReference, lit: Literal) =>
        toScalaV(lit).foreach(addLo(a.name, _))
      case GreaterThan(a: AttributeReference, lit: Literal) =>
        toScalaV(lit).foreach(addLo(a.name, _)) // widened to inclusive
      case LessThanOrEqual(a: AttributeReference, lit: Literal) =>
        toScalaV(lit).foreach(addHi(a.name, _))
      case LessThan(a: AttributeReference, lit: Literal) =>
        toScalaV(lit).foreach(addHi(a.name, _))
      case EqualTo(a: AttributeReference, lit: Literal) =>
        toScalaV(lit).foreach { v => addLo(a.name, v); addHi(a.name, v) }
      // literal-on-left mirrors
      case GreaterThanOrEqual(lit: Literal, a: AttributeReference) =>
        toScalaV(lit).foreach(addHi(a.name, _))
      case GreaterThan(lit: Literal, a: AttributeReference) =>
        toScalaV(lit).foreach(addHi(a.name, _))
      case LessThanOrEqual(lit: Literal, a: AttributeReference) =>
        toScalaV(lit).foreach(addLo(a.name, _))
      case LessThan(lit: Literal, a: AttributeReference) =>
        toScalaV(lit).foreach(addLo(a.name, _))
      case EqualTo(lit: Literal, a: AttributeReference) =>
        toScalaV(lit).foreach { v => addLo(a.name, v); addHi(a.name, v) }
      case _ => () // not translatable: contributes no range
    }
    walk(cond)
    out.toMap
  }

  private def prune(cond: Expression,
      l: LogicalRelation): Option[LogicalRelation] = {
    val fsRel = l.relation match {
      case h: HadoopFsRelation if h.partitionSchema.isEmpty => h
      case _ => return None
    }
    val roots = fsRel.location.rootPaths.map(p => normalize(p.toString))
    if (roots.isEmpty) return None
    val tableDir = registeredDirOf(roots).getOrElse(return None)
    val rs = ranges(cond)
    if (rs.isEmpty) return None
    val spark = fsRel.sparkSession
    val (kept, all) =
      graft.sources.TxLog.pruneSnapshot(spark, tableDir, rs)
        .getOrElse(return None)
    // prune only the exact latest snapshot, and only when it helps
    if (roots.toSet != all.map(normalize).toSet) return None
    if (kept.size == all.size) return None
    val newIndex = new InMemoryFileIndex(spark,
      kept.map(new Path(_)), Map.empty, Some(fsRel.dataSchema))
    Some(l.copy(relation =
      fsRel.copy(location = newIndex)(spark)))
  }
}
