package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the CRS transform (SURVEY §2.8 F11 —
  * the reference's pyproj EPSG:4326↔5071 hop,
  * /root/reference/data/src/utils/census.py:50-71,159-169).
  *
  * The math lives in [[graft.geo.Albers]] (static forwarders), so
  * `doGenCode` emits a direct static call inside the generated row loop:
  * no UDF wrapper, no Scala-function dispatch, no Option/Row boxing —
  * the projection participates in whole-stage codegen like a built-in.
  * Each call returns one primitive double[2] wrapped as an unsafe-free
  * GenericArrayData; that single small allocation replaces the UDF
  * path's Row + boxed-Double churn.
  */
abstract class AlbersExpression extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  /** static method name the generated code calls, e.g. `forwardArr`. */
  protected def method: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.geo.Albers.$method($a, $b));""".stripMargin)
}

/** (lon, lat) degrees → array(x, y) meters in EPSG:5071. */
case class AlbersForward(left: Expression, right: Expression) extends AlbersExpression {
  override def prettyName: String = "albers_fwd"
  override protected def method: String = "forwardArr"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    new GenericArrayData(graft.geo.Albers.forwardArr(
      l.asInstanceOf[Double], r.asInstanceOf[Double]))
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** (x, y) meters in EPSG:5071 → array(lon, lat) degrees. */
case class AlbersInverse(left: Expression, right: Expression) extends AlbersExpression {
  override def prettyName: String = "albers_inv"
  override protected def method: String = "inverseArr"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    new GenericArrayData(graft.geo.Albers.inverseArr(
      l.asInstanceOf[Double], r.asInstanceOf[Double]))
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
