package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native backward as-of join — the whole-operator Catalyst extension
  * (logical node + strategy + physical plan, injected through
  * `GraftExtensions`): for each left row, the LAST right row with the
  * same key whose time is ≤ the left time and within `tolerance`.
  *
  * The composed formulation ([[graft.operators.AsOfJoin.backward]])
  * expresses the same semantics with a union + running window — but it
  * (1) inflates the shuffle with null-padded union rows carrying every
  * left column through the window sort, and (2) can only sweep SCALAR
  * payloads forward (one `last(when(...))` per carried column). The
  * native operator shuffles each side once on its own key, zipper-merges
  * sorted partitions in one streaming pass (O(1) state: one candidate
  * row), and attaches the ENTIRE matched right row.
  *
  * Determinism: children are sorted by (key, time, rightTieBreak…); the
  * merge keeps the last right row ≤ the probe time, so equal-time
  * matches resolve by the caller's tie-break columns, not partition
  * luck.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression],
    tolerance: Long)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt, tb, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, tb, tol) :: Nil
    case _ => Nil
  }
}

/** Physical sort-merge as-of join. EnsureRequirements co-partitions the
  * children on their keys and sorts them by (key, time, tieBreak…); the
  * merge itself is a single forward pass per partition with one buffered
  * candidate row — no materialized right-side group, no window state.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression],
    tolerance: Long)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTieBreak.map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lRdd = left.execute()
    val rRdd = right.execute()
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"as-of join children not co-partitioned: ${lRdd.getNumPartitions} vs ${rRdd.getNumPartitions}")
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val lKeyExpr = leftKey
    val lTimeExpr = leftTime
    val rKeyExpr = rightKey
    val rTimeExpr = rightTime
    val tol = tolerance
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      val lKey = BindReferences.bindReference(lKeyExpr, lOut)
      val lTime = BindReferences.bindReference(lTimeExpr, lOut)
      val rKey = BindReferences.bindReference(rKeyExpr, rOut)
      val rTime = BindReferences.bindReference(rTimeExpr, rOut)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      var rHead: InternalRow = null // fetched but not yet consumed
      var cand: InternalRow = null  // last consumed right row (copied)
      lIter.map { lRow =>
        val lk = lKey.eval(lRow)
        val lt = lTime.eval(lRow).asInstanceOf[Long]
        var advance = true
        while (advance) {
          if (rHead == null && rIter.hasNext) rHead = rIter.next()
          if (rHead == null) advance = false
          else {
            val c = keyOrd.compare(rKey.eval(rHead), lk)
            if (c < 0) rHead = null // left keys only grow: never needed again
            else if (c == 0 && rTime.eval(rHead).asInstanceOf[Long] <= lt) {
              cand = rHead.copy(); rHead = null
            } else advance = false
          }
        }
        val ok = cand != null &&
          keyOrd.compare(rKey.eval(cand), lk) == 0 &&
          lt - rTime.eval(cand).asInstanceOf[Long] <= tol
        resultProj(joined(lRow, if (ok) cand else nullRight))
      }
    }
  }
}
