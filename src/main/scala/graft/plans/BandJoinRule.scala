package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: band-join rewrite.
  *
  * A join whose only cross-relation predicate is a band condition
  * `abs(l.x − r.y) <= c` has no equi keys, so Spark plans it as a
  * broadcast-nested-loop or cartesian product — O(n·m) and
  * un-partitionable, the plan that dies first at 100 TB. But the band
  * condition admits the classic bucket trick (the same prefilter q86
  * builds by hand, here applied by the *planner* so any user query
  * benefits): with bucket width 2c, matching rows differ by at most one
  * bucket, so
  *
  *   left  → project  _bkt   = floor(x / 2c)
  *   right → generate _bkt ∈ { floor(y/2c)−1, floor(y/2c), floor(y/2c)+1 }
  *   join on _bkt equality AND the original condition.
  *
  * The result is a hash-partitionable equi-join (shuffle on _bkt,
  * skew-salvageable by AQE) whose candidate set only pays the exact
  * predicate — 3/|buckets| of the cross product instead of all of it.
  * Fixed-point safe: the rewritten join has an equi predicate, so the
  * rule no longer matches it. Registered via
  * [[graft.GraftExtensions]] (`injectOptimizerRule`).
  */
object BandJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  /** (leftExpr, rightExpr, halfWidth) for `abs(a − b) <= c`, sides
    * normalized so the first component binds to `left`.
    */
  private def bandPredicate(
      cond: Expression,
      left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Double)] = cond match {
    case LessThanOrEqual(abs: Abs, Literal(c, t)) =>
      val width = t match {
        case DoubleType => c.asInstanceOf[Double]
        case LongType => c.asInstanceOf[Long].toDouble
        case org.apache.spark.sql.types.IntegerType => c.asInstanceOf[Int].toDouble
        case _ => return None
      }
      if (width <= 0) return None
      abs.child match {
        case Subtract(a, b, _) =>
          if (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet))
            Some((a, b, width))
          else if (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
            Some((b, a, width))
          else None
        case _ => None
      }
    case _ => None
  }

  private def isEqui(e: Expression, left: LogicalPlan, right: LogicalPlan): Boolean = e match {
    case EqualTo(a, b) =>
      (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
        (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner | Cross, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      // only rescue joins that would otherwise have NO equi keys
      if (conjuncts.exists(isEqui(_, left, right))) j
      else conjuncts.flatMap(bandPredicate(_, left, right)).headOption match {
        case None => j
        case Some((lx, ry, halfWidth)) =>
          val w = Literal(2.0 * halfWidth, DoubleType)
          def bucket(e: Expression): Expression = Floor(Divide(Cast(e, DoubleType), w))
          val lAlias = Alias(bucket(lx), "_graft_bkt_l")()
          val newLeft = Project(left.output :+ lAlias, left)
          val rBkt = bucket(ry)
          val arr = CreateArray(Seq(
            Subtract(rBkt, Literal(1L, LongType)), rBkt, Add(rBkt, Literal(1L, LongType))))
          val rAttr = AttributeReference("_graft_bkt_r", LongType, nullable = true)()
          val newRight = Generate(Explode(arr), Nil, outer = false, None, Seq(rAttr), right)
          val newJoin = Join(newLeft, newRight, Inner,
            Some(And(EqualTo(lAlias.toAttribute, rAttr), cond)), hint)
          Project(j.output, newJoin)
      }
  }
}
