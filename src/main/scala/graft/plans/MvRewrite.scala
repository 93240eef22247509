package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import scala.collection.concurrent.TrieMap

/** Materialized-view rewrite — aggregate navigation as a Catalyst
  * optimizer rule.
  *
  * At 100 TB the same `GROUP BY dim` rollups are recomputed constantly;
  * the warehouse answer is to materialize them once and have the
  * PLANNER substitute the view whenever a query's aggregate is
  * subsumed by it — users keep writing queries against the base table.
  * [[MvCatalog.register]] materializes `base GROUP BY g → count(1),
  * sum/min/max(measures)` to parquet and records the mapping;
  * [[MvRewriteRule]] (injected via `graft.GraftExtensions`) then
  * replaces any matching `Aggregate` over the base relation with a scan
  * of the view — a TB scan becomes a KB scan, no user opt-in.
  *
  * Matching is deliberately conservative (exact base paths, grouping
  * set equal to the view's, only count/sum/min/max without
  * DISTINCT/FILTER, nothing but column-pruning Projects between the
  * aggregate and the scan) — a near-miss silently falls through to the
  * normal plan, never to a wrong rewrite. Output attribute ids and
  * types are preserved via aliases, so parent operators are untouched.
  *
  * Staleness: a view is consulted only while its `valid` flag holds;
  * [[MvCatalog.invalidate]] drops it (e.g. after a base write), and a
  * CDC-maintained view can be kept fresh with
  * [[graft.operators.Cdc.incrementalAgg]] + re-register. The registry
  * is driver-side state — exactly where Catalyst rules run.
  */
object MvCatalog {

  final case class MvEntry(
      name: String,
      basePaths: Set[String],
      groupCols: Seq[String],
      measures: Map[String, String], // canonical agg key -> view column
      view: LogicalRelation,
      var valid: Boolean)

  private val entries = TrieMap.empty[String, MvEntry]

  private def relationOf(spark: SparkSession, path: String): LogicalRelation =
    spark.read.parquet(path).queryExecution.analyzed.collectFirst {
      case l: LogicalRelation => l
    }.getOrElse(throw new IllegalStateException(s"no relation for $path"))

  /** Materialize `parquet(basePath) GROUP BY groupCols → count(1) AS n,
    * sum(m) AS sum_m, min(m) AS min_m, max(m) AS max_m` to `mvPath` and
    * register it for rewriting.
    */
  def register(
      spark: SparkSession,
      name: String,
      basePath: String,
      groupCols: Seq[String],
      measureCols: Seq[String],
      mvPath: String): Unit = {
    val base = spark.read.parquet(basePath)
    val aggs = count(lit(1)).as("n") +:
      measureCols.flatMap(m => Seq(
        sum(col(m)).as(s"sum_$m"),
        min(col(m)).as(s"min_$m"),
        max(col(m)).as(s"max_$m")))
    // The materialization is itself a subsumable aggregate: with a prior
    // registration live, the rewrite rule would redirect THIS query to
    // the view directory the overwrite is about to clear (read-under-
    // overwrite -> FILE_NOT_EXIST). Suspend the rule for the rebuild.
    MvRewriteRule.suspend {
      base.groupBy(groupCols.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
        .write.mode("overwrite").parquet(mvPath)
    }
    // re-registration overwrites the view's parquet: drop any stale
    // file-listing/cache state for the path before capturing the new
    // relation, or a previously-planned query could still reference the
    // replaced part files
    spark.catalog.refreshByPath(mvPath)
    val measures = Map("count" -> "n") ++
      measureCols.flatMap(m => Seq(
        s"sum:$m" -> s"sum_$m", s"min:$m" -> s"min_$m", s"max:$m" -> s"max_$m"))
    entries(name) = MvEntry(
      name,
      rootPaths(relationOf(spark, basePath)),
      groupCols, measures,
      relationOf(spark, mvPath),
      valid = true)
  }

  def invalidate(name: String): Unit = entries.get(name).foreach(_.valid = false)
  def drop(name: String): Unit = entries.remove(name)

  /** All candidates that could answer an aggregate over `basePaths` —
    * the CALLER checks grouping/measure subsumption per entry, so two
    * views registered over the same base both get a chance (an
    * arbitrary-pick here used to shadow the matching one).
    */
  def candidates(basePaths: Set[String]): Iterable[MvEntry] =
    entries.values.filter(e => e.valid && e.basePaths == basePaths)

  private def normalize(p: String): String =
    p.stripPrefix("file:").replaceAll("/+$", "")

  /** Auto-invalidation hook: any write landing at-or-under a registered
    * base path (or a base path landing under the written root) flips
    * the affected views invalid, closing the stale-view window without
    * user action. Called by [[graft.sources.TxLog.commit]] and
    * [[graft.sources.TableIO.writePartitioned]]; cheap no-op when
    * nothing is registered.
    */
  def invalidateByPath(writtenPath: String): Unit = {
    val w = normalize(writtenPath)
    entries.values.foreach { e =>
      if (e.valid && e.basePaths.exists { bp =>
          val b = normalize(bp)
          w == b || w.startsWith(b + "/") || b.startsWith(w + "/")
        }) e.valid = false
    }
  }

  def rootPaths(rel: LogicalRelation): Set[String] = rel.relation match {
    case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString).toSet
    case _ => Set.empty
  }
}

object MvRewriteRule extends Rule[LogicalPlan] {

  private val suspended = new ThreadLocal[Boolean] {
    override def initialValue: Boolean = false
  }

  /** Run `f` with the rewrite disabled on this thread (view rebuilds). */
  private[plans] def suspend[A](f: => A): A = {
    suspended.set(true)
    try f finally suspended.set(false)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (suspended.get) plan
    else plan.transformUp {
      case agg: Aggregate => rewrite(agg).getOrElse(agg)
    }

  /** The base table's root paths under the aggregate, seen through
    * column-pruning Projects only — a Filter (or anything else) makes
    * the aggregate not view-subsumed and kills the match. A cached base
    * (`InMemoryRelation`) still matches when its cached plan is a PLAIN
    * scan (no filters, no computed projections): the session caching
    * the base table must not silently disable aggregate navigation —
    * the KB-sized view scan beats re-aggregating even an in-memory
    * copy of the full table.
    */
  private def basePaths(plan: LogicalPlan): Option[Set[String]] = plan match {
    case r: LogicalRelation => Some(MvCatalog.rootPaths(r))
    case m: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
      val phys = m.cacheBuilder.cachedPlan
      val unsafeNode = phys.collectFirst {
        case _: org.apache.spark.sql.execution.FilterExec => ()
        case p: org.apache.spark.sql.execution.ProjectExec
          if !p.projectList.forall(_.isInstanceOf[AttributeReference]) => ()
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.dataFilters.nonEmpty || f.partitionFilters.nonEmpty => ()
      }
      val paths = phys.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.rootPaths.map(_.toString)
      }.flatten.toSet
      if (unsafeNode.isEmpty && paths.nonEmpty) Some(paths) else None
    case Project(projectList, child) if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      basePaths(child)
    case _ => None
  }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    val paths = basePaths(agg.child).getOrElse(return None)
    val groupNames = agg.groupingExpressions.map {
      case a: AttributeReference => a.name
      case _ => return None
    }
    // try every registered view over this base: the first whose grouping
    // AND measures subsume the aggregate wins (an arbitrary single pick
    // used to shadow a matching sibling view — round-5 advice). A query
    // grouping by a SUBSET of the view's keys is answered by
    // re-aggregating the view (aggregate navigation proper).
    MvCatalog.candidates(paths).view
      .filter(e => groupNames.toSet.subsetOf(e.groupCols.toSet))
      .flatMap(e => rewriteWith(agg, groupNames, e))
      .headOption
  }

  import org.apache.spark.sql.types.{DataType, DecimalType, IntegerType, LongType}

  /** Re-summing PARTIAL sums is only value-identical to the base
    * aggregate when addition is associative — integer/decimal sums, not
    * float. Rollup sum/avg therefore require an integral view column;
    * min/max/count compose for any type.
    */
  private def associative(dt: DataType): Boolean =
    dt == LongType || dt == IntegerType || dt.isInstanceOf[DecimalType]

  private def rewriteWith(
      agg: Aggregate,
      groupNames: Seq[String],
      entry: MvCatalog.MvEntry): Option[LogicalPlan] = {

    val exact = groupNames.toSet == entry.groupCols.toSet
    val view = entry.view.newInstance()
    val viewAttr = view.output.map(a => a.name -> a).toMap

    def measureAttr(key: String): Option[Attribute] =
      entry.measures.get(key).flatMap(viewAttr.get)

    /** avg(m) = sum_m / n in double. For integral inputs below the 2⁵³
      * exact-double envelope this matches Spark's Average bit-for-bit
      * (Average also accumulates integral input in double; integer
      * additions under 2⁵³ are exact in any order). Float measures are
      * rejected — their sum_m was accumulated in a different order than
      * Average's internal sum would be.
      */
    def avgExpr(sumAgg: Expression, nAgg: Expression): Expression =
      Divide(Cast(sumAgg, org.apache.spark.sql.types.DoubleType),
        Cast(nAgg, org.apache.spark.sql.types.DoubleType))

    if (exact) {
      val projections: Seq[NamedExpression] = agg.aggregateExpressions.map {
        case a: AttributeReference =>
          val mv = viewAttr.getOrElse(a.name, return None)
          Alias(castIfNeeded(mv, a.dataType), a.name)(exprId = a.exprId)
        case al @ Alias(AggregateExpression(fn, _, false, None, _), name) =>
          val repl: Expression = fn match {
            case Count(Seq(Literal(_, _))) =>
              measureAttr("count").getOrElse(return None)
            case Sum(ar: AttributeReference, _) =>
              measureAttr(s"sum:${ar.name}").getOrElse(return None)
            case Min(ar: AttributeReference) =>
              measureAttr(s"min:${ar.name}").getOrElse(return None)
            case Max(ar: AttributeReference) =>
              measureAttr(s"max:${ar.name}").getOrElse(return None)
            case Average(ar: AttributeReference, _) =>
              val s = measureAttr(s"sum:${ar.name}").getOrElse(return None)
              val n = measureAttr("count").getOrElse(return None)
              if (!associative(s.dataType)) return None
              avgExpr(s, n)
            case _ => return None
          }
          Alias(castIfNeeded2(repl, al.dataType), name)(exprId = al.exprId)
        case _ => return None
      }
      Some(Project(projections, view))
    } else {
      // ROLLUP: GROUP BY a subset of the view keys over the view itself.
      // count → sum(n); sum → sum(sum_m) (associative types only);
      // min/max → min(min_m)/max(max_m); avg → sum(sum_m)/sum(n).
      def reAgg(fn: AggregateFunction): Expression =
        AggregateExpression(fn, org.apache.spark.sql.catalyst.expressions.aggregate.Complete,
          isDistinct = false)
      val aggExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
        case a: AttributeReference => // a grouping column
          val mv = viewAttr.getOrElse(a.name, return None)
          Alias(castIfNeeded(mv, a.dataType), a.name)(exprId = a.exprId)
        case al @ Alias(AggregateExpression(fn, _, false, None, _), name) =>
          val repl: Expression = fn match {
            case Count(Seq(Literal(_, _))) =>
              reAgg(Sum(measureAttr("count").getOrElse(return None)))
            case Sum(ar: AttributeReference, _) =>
              val s = measureAttr(s"sum:${ar.name}").getOrElse(return None)
              if (!associative(s.dataType)) return None
              reAgg(Sum(s))
            case Min(ar: AttributeReference) =>
              reAgg(Min(measureAttr(s"min:${ar.name}").getOrElse(return None)))
            case Max(ar: AttributeReference) =>
              reAgg(Max(measureAttr(s"max:${ar.name}").getOrElse(return None)))
            case Average(ar: AttributeReference, _) =>
              val s = measureAttr(s"sum:${ar.name}").getOrElse(return None)
              if (!associative(s.dataType)) return None
              avgExpr(reAgg(Sum(s)),
                reAgg(Sum(measureAttr("count").getOrElse(return None))))
            case _ => return None
          }
          Alias(castIfNeeded2(repl, al.dataType), name)(exprId = al.exprId)
        case _ => return None
      }
      val grouping = groupNames.map(n => viewAttr.getOrElse(n, return None))
      Some(Aggregate(grouping, aggExprs, view))
    }
  }

  private def castIfNeeded(a: Attribute, to: org.apache.spark.sql.types.DataType): Expression =
    if (a.dataType == to) a else Cast(a, to)

  private def castIfNeeded2(e: Expression, to: org.apache.spark.sql.types.DataType): Expression =
    if (e.dataType == to) e else Cast(e, to)
}
