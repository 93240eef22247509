package graft

import graft.plans.FloatDotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension point for spark-submit users:
  *
  *   --conf spark.sql.extensions=graft.GraftExtensions
  *
  * registers the engine's native expressions for SQL use (programmatic
  * sessions can call `VectorFunctions.register` instead — same builder).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.BandJoinRule)
    // aggregate navigation: substitute registered materialized views
    e.injectOptimizerRule(_ => graft.plans.MvRewriteRule)
    // automatic manifest-level file skipping for registered TxLog scans
    e.injectOptimizerRule(_ => graft.plans.TxPruneRule)
    // join-driven (dynamic) manifest file skipping for registered scans
    e.injectOptimizerRule(_ => graft.plans.DynPruneRule)
    // metadata-only count/min/max/count(col) for registered TxLog scans
    e.injectOptimizerRule(_ => graft.plans.TxAggRule)
    // manifest-exact row counts → Catalyst Statistics for registered
    // TxLog scans (broadcast-vs-merge from real counts, not file bytes)
    e.injectOptimizerRule(_ => graft.plans.TxStatsRule)
    // whole-operator extension: the native as-of join's physical planning
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "vec_dot"),
      (exprs: Seq[Expression]) => FloatDotProduct(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("weighted_mean"),
      new ExpressionInfo(classOf[graft.plans.WeightedMeanAgg].getName, "weighted_mean"),
      (exprs: Seq[Expression]) =>
        graft.plans.WeightedMeanAgg(exprs.head, exprs(1)).toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("albers_fwd"),
      new ExpressionInfo(classOf[graft.plans.AlbersForward].getName, "albers_fwd"),
      (exprs: Seq[Expression]) => graft.plans.AlbersForward(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("albers_inv"),
      new ExpressionInfo(classOf[graft.plans.AlbersInverse].getName, "albers_inv"),
      (exprs: Seq[Expression]) => graft.plans.AlbersInverse(exprs.head, exprs(1))))
    // kmv_distinct(hash_u32, k): bounded-state distinct estimate
    e.injectFunction((
      FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[graft.plans.KmvSketchAgg].getName, "kmv_distinct"),
      (exprs: Seq[Expression]) => graft.plans.KmvSketchAgg(
        exprs.head, intLit(exprs(1), "kmv_distinct")).toAggregateExpression()))
    // mg_heavy_candidates(value, k): Misra-Gries candidate superset
    e.injectFunction((
      FunctionIdentifier("mg_heavy_candidates"),
      new ExpressionInfo(classOf[graft.plans.FreqSketchAgg].getName, "mg_heavy_candidates"),
      (exprs: Seq[Expression]) => graft.plans.FreqSketchAgg(
        exprs.head, intLit(exprs(1), "mg_heavy_candidates")).toAggregateExpression()))
    // table-valued lakehouse surface: SELECT * FROM graft_snapshot(dir
    // [, version]) / graft_changes(dir, from, to) / graft_history(dir)
    // — the Delta-style pure-SQL consumer API (plans.TxTableFunctions)
    e.injectTableFunction((
      FunctionIdentifier("graft_snapshot"),
      new ExpressionInfo(graft.plans.TxTableFunctions.getClass.getName, "graft_snapshot"),
      (exprs: Seq[Expression]) => graft.plans.TxTableFunctions.snapshot(exprs)))
    e.injectTableFunction((
      FunctionIdentifier("graft_changes"),
      new ExpressionInfo(graft.plans.TxTableFunctions.getClass.getName, "graft_changes"),
      (exprs: Seq[Expression]) => graft.plans.TxTableFunctions.changes(exprs)))
    e.injectTableFunction((
      FunctionIdentifier("graft_history"),
      new ExpressionInfo(graft.plans.TxTableFunctions.getClass.getName, "graft_history"),
      (exprs: Seq[Expression]) => graft.plans.TxTableFunctions.history(exprs)))
    e.injectTableFunction((
      FunctionIdentifier("graft_consumers"),
      new ExpressionInfo(graft.plans.TxTableFunctions.getClass.getName, "graft_consumers"),
      (exprs: Seq[Expression]) => graft.plans.TxTableFunctions.consumers(exprs)))
    e.injectTableFunction((
      FunctionIdentifier("graft_consistent"),
      new ExpressionInfo(graft.plans.TxTableFunctions.getClass.getName, "graft_consistent"),
      (exprs: Seq[Expression]) => graft.plans.TxTableFunctions.consistent(exprs)))
    e.injectTableFunction((
      FunctionIdentifier("graft_tag"),
      new ExpressionInfo(graft.plans.TxTableFunctions.getClass.getName, "graft_tag"),
      (exprs: Seq[Expression]) => graft.plans.TxTableFunctions.tagRead(exprs)))
    e.injectTableFunction((
      FunctionIdentifier("graft_tags"),
      new ExpressionInfo(graft.plans.TxTableFunctions.getClass.getName, "graft_tags"),
      (exprs: Seq[Expression]) => graft.plans.TxTableFunctions.tagsList(exprs)))
  }

  private def intLit(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int k, got $other")
  }
}
