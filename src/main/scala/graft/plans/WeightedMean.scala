package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types._

/** A1 — grouped weighted mean with zero-weight fallback
  * (/root/reference/data/src/utils/census.py:9-47) as a single
  * DeclarativeAggregate: the buffer and update/merge/evaluate steps are
  * pure Catalyst expressions, so the aggregate participates in
  * whole-stage codegen and map-side partial aggregation exactly like a
  * built-in — no ImperativeAggregate boxing.
  *
  * Semantics: Σ(v·w)/Σw when Σw ≠ 0, else plain mean(v); null inputs are
  * skipped; empty input → null.
  */
case class WeightedMeanAgg(value: Expression, weight: Expression)
  extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(value, weight)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "weighted_mean"

  private lazy val sumVW = AttributeReference("sumVW", DoubleType, nullable = false)()
  private lazy val sumW = AttributeReference("sumW", DoubleType, nullable = false)()
  private lazy val sumV = AttributeReference("sumV", DoubleType, nullable = false)()
  private lazy val cnt = AttributeReference("cnt", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(sumVW, sumW, sumV, cnt)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal(0.0), Literal(0.0), Literal(0L))

  private def bothSet: Expression =
    And(IsNotNull(value), IsNotNull(weight))
  private def d(e: Expression): Expression = Cast(e, DoubleType)

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(bothSet, Add(sumVW, Multiply(d(value), d(weight))), sumVW),
    If(bothSet, Add(sumW, d(weight)), sumW),
    If(bothSet, Add(sumV, d(value)), sumV),
    If(bothSet, Add(cnt, Literal(1L)), cnt))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Add(sumVW.left, sumVW.right),
    Add(sumW.left, sumW.right),
    Add(sumV.left, sumV.right),
    Add(cnt.left, cnt.right))

  override lazy val evaluateExpression: Expression =
    If(EqualTo(cnt, Literal(0L)),
      Literal(null, DoubleType),
      If(EqualTo(sumW, Literal(0.0)),
        Divide(sumV, Cast(cnt, DoubleType)),
        Divide(sumVW, sumW)))

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0), weight = newChildren(1))
}

object WeightedMeanAgg {
  /** Column-level weighted mean: `weightedMean($"x", $"pop")`. */
  def weightedMean(v: Column, w: Column): Column =
    SqlBridge.column(
      WeightedMeanAgg(SqlBridge.expression(v), SqlBridge.expression(w))
        .toAggregateExpression())
}
