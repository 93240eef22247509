package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}

/** DYNAMIC file pruning for TxLog tables — the join-driven counterpart
  * of [[TxPruneRule]]'s static predicate pruning (what Delta calls
  * dynamic file pruning and Spark approximates with DPP over hive
  * partitions, here driven by the table format's own manifest stats).
  *
  * Shape: an equi-join whose ONE side scans a registered TxLog table's
  * latest snapshot and whose OTHER side is a small, deterministic,
  * batch plan (≤ the broadcast threshold by Catalyst's estimate — the
  * side the planner would broadcast anyway). At optimization time the
  * rule EXECUTES the small side's join-key projection (distinct, capped
  * at [[maxKeys]]), asks the manifest which batches could possibly hold
  * any of those keys (committed [min,max] containment AND, when the
  * commit recorded one, a per-batch Bloom probe), and swaps the fact
  * scan's file index for the survivors. Over the cap it falls back to a
  * single min/max range probe.
  *
  * Soundness:
  *  - only fact rows whose key EQUALS some dim key can reach the output
  *    of an inner/semi join (outer joins prune only the nullable side),
  *    and NULL keys never equi-match — so a batch containing no
  *    possibly-matching key contributes nothing; dropping it cannot
  *    change results. Batches without stats for the column are kept;
  *    bloom false positives only KEEP batches;
  *  - the dim side must be fully deterministic (it is evaluated once at
  *    planning time and again at execution; a `rand()` in between could
  *    make the prune wrong) and non-streaming;
  *  - key types are restricted to int/long/float/double/string — the
  *    kinds the manifest's stats comparator decodes exactly; anything
  *    else declines;
  *  - the swap happens only when the scan's roots equal the table's
  *    LATEST manifest set exactly (same gate as [[TxPruneRule]]): a
  *    time-travel read never prunes against the wrong manifest, and a
  *    pruned scan's strict-subset roots can never re-fire the rule. A
  *    processed join is tagged so fixed-point re-runs of the optimizer
  *    batch never re-execute the dim query.
  *
  * At 100 TB this is the "star-join touches one day's files" fast path:
  * the dim filter (`WHERE d_date = …`) never mentions the fact table's
  * sort key, so static pruning can't help — but the join keys it
  * selects are exactly what the manifest can prune on, before Spark
  * lists a single fact file.
  */
object DynPruneRule extends Rule[LogicalPlan] {

  /** Cap on collected distinct dim keys; beyond it the rule degrades to
    * one min/max range probe (still sound, usually still selective).
    */
  @volatile var maxKeys: Int = 10000

  private val done = TreeNodeTag[Boolean]("graft.dynprune.done")

  /** Re-entrance guard: evaluating the dim side runs the optimizer on
    * its plan (same thread), which must not re-enter this rule.
    */
  private val evaluating = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!TxPruneRule.anyRegistered || evaluating.get()) plan
    else plan.transformUp {
      case j: Join if j.getTagValue(done).isEmpty && j.condition.isDefined &&
          !j.isStreaming =>
        tryPrune(j) match {
          case Evaluated(Some(pruned)) =>
            // subsequent fixed-point iterations must neither re-run the
            // dim query nor re-read the manifest
            pruned.setTagValue(done, true)
            pruned
          case Evaluated(None) =>
            // dim was executed but no batch pruned: remember, or every
            // fixed-point iteration would re-run the dim query
            j.setTagValue(done, true)
            j
          case Declined =>
            // cheap structural decline (wrong shape, stats still large
            // mid-optimization): stay untagged — a later iteration may
            // see a prunable plan (e.g. after column pruning shrinks
            // the dim estimate)
            j
        }
    }

  private sealed trait Outcome
  private case class Evaluated(result: Option[Join]) extends Outcome
  private case object Declined extends Outcome

  /** Equi pairs (leftAttr, rightAttr) from the join condition's
    * top-level AND conjuncts.
    */
  private def equiPairs(j: Join): Seq[(Attribute, Attribute)] = {
    def walk(e: Expression): Seq[(Attribute, Attribute)] = e match {
      case And(a, b) => walk(a) ++ walk(b)
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        if (j.left.outputSet.contains(a) && j.right.outputSet.contains(b))
          Seq((a, b))
        else if (j.left.outputSet.contains(b) && j.right.outputSet.contains(a))
          Seq((b, a))
        else Seq.empty
      case _ => Seq.empty
    }
    j.condition.map(walk).getOrElse(Seq.empty)
  }

  /** The TxLog scan under a side's Project/Filter chain (attribute ids
    * pass through both untouched, so the join key resolves to the
    * relation's own output).
    */
  private def scanOf(side: LogicalPlan): Option[LogicalRelation] = side match {
    case l: LogicalRelation => Some(l)
    case p: Project => scanOf(p.child)
    case f: Filter => scanOf(f.child)
    case _ => None
  }

  private def supportedKey(v: Any): Boolean = v match {
    case _: Int | _: Long | _: Short | _: Byte | _: Float | _: Double |
        _: String => true
    case _ => false
  }

  private def tryPrune(j: Join): Outcome = {
    val pairs = equiPairs(j)
    if (pairs.isEmpty) return Declined
    // (fact side is left?) candidates allowed by the join type: rows of
    // a prunable side reach the output only through a key match
    val sides: Seq[Boolean] = j.joinType match {
      case Inner => Seq(true, false)
      case LeftSemi => Seq(true)
      case RightOuter => Seq(true)
      case LeftOuter => Seq(false)
      case _ => Seq.empty
    }
    var evaluated = false
    for (s <- sides) pruneSide(j, pairs, s) match {
      case Evaluated(Some(p)) => return Evaluated(Some(p))
      case Evaluated(None) => evaluated = true
      case Declined => ()
    }
    if (evaluated) Evaluated(None) else Declined
  }

  private def pruneSide(j: Join, pairs: Seq[(Attribute, Attribute)],
      factIsLeft: Boolean): Outcome = {
    val (factSide, dimSide) =
      if (factIsLeft) (j.left, j.right) else (j.right, j.left)
    val l = scanOf(factSide).getOrElse(return Declined)
    val fsRel = l.relation match {
      case h: HadoopFsRelation if h.partitionSchema.isEmpty => h
      case _ => return Declined
    }
    val roots = fsRel.location.rootPaths.map(p => TxPruneRule.norm(p.toString))
    if (roots.isEmpty) return Declined
    val tableDir = TxPruneRule.registeredDirOf(roots).getOrElse(return Declined)
    // the join key must be a bare column of the scan itself
    val (factAttr, dimAttr) = pairs.collectFirst {
      case (a, b) if factIsLeft && l.outputSet.contains(a) => (a, b)
      case (a, b) if !factIsLeft && l.outputSet.contains(b) => (b, a)
    }.getOrElse(return Declined)
    // dim side: bounded, deterministic, batch
    if (dimSide.isStreaming) return Declined
    if (dimSide.exists(p => p.expressions.exists(e => !e.deterministic)))
      return Declined
    val cap = math.max(conf.autoBroadcastJoinThreshold, 8L << 20)
    if (dimSide.stats.sizeInBytes > cap) return Declined

    val spark = fsRel.sparkSession
    // latest-snapshot pre-gate BEFORE paying the dim evaluation: a
    // time-travel read (or an already-pruned scan's subset roots) can
    // never become the latest set, so don't run the dim query for it
    graft.sources.TxLog.pruneSnapshot(spark, tableDir, Map.empty) match {
      case Some((_, all0)) =>
        if (roots.toSet != all0.map(TxPruneRule.norm).toSet)
          return Declined
      case None => return Declined
    }
    val keptAll = {
      evaluating.set(true)
      try {
        val one = SqlBridge.ofRows(spark, Project(Seq(dimAttr), dimSide))
        val keys = one.distinct().limit(maxKeys + 1).collect()
          .map(_.get(0)).filter(_ != null).toSeq
        if (keys.exists(!supportedKey(_))) return Evaluated(None)
        if (keys.length > maxKeys) {
          // over the cap: one min/max probe instead (still sound)
          import org.apache.spark.sql.functions.{max, min}
          val c = one.col(one.columns.head)
          val r = one.agg(min(c), max(c)).collect()(0)
          if (r.isNullAt(0)) return Evaluated(None)
          graft.sources.TxLog.pruneSnapshot(spark, tableDir,
            Map(factAttr.name -> (Some(r.get(0)), Some(r.get(1)))))
        } else {
          graft.sources.TxLog.pruneSnapshotKeys(spark, tableDir,
            factAttr.name, keys)
        }
      } finally evaluating.set(false)
    }
    val (kept, all) = keptAll.getOrElse(return Evaluated(None))
    // only the exact latest snapshot, and only when it helps
    if (roots.toSet != all.map(TxPruneRule.norm).toSet) return Evaluated(None)
    if (kept.size == all.size) return Evaluated(None)
    val newIndex = new InMemoryFileIndex(spark,
      kept.map(new Path(_)), Map.empty, Some(fsRel.dataSchema))
    val newL = l.copy(relation = fsRel.copy(location = newIndex)(spark))
    val newFact = factSide.transformUp {
      case l2: LogicalRelation if l2 eq l => newL
    }
    Evaluated(Some(
      if (factIsLeft) j.copy(left = newFact) else j.copy(right = newFact)))
  }
}
