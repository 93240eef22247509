package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 moved these conversions behind
  * `private[sql]` (org.apache.spark.sql.classic.ExpressionUtils); placing
  * this object under the sql package namespace is the conventional
  * extension-library access point (cf. SNIPPETS.md [3], the Qbeast
  * DatasetFactory pattern).
  */
object SqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from pre-built InternalRows — lets a high-volume operator
    * skip the product-encoder serialization path entirely (the operator
    * constructs rows with cached UTF8Strings instead of per-row
    * String→UTF8String conversions).
    */
  def internalCreateDataFrame(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** Streaming-tagged variant — the wrapper a V1 `Source.getBatch`
    * needs when its micro-batch is a COMPOSED plan (joins/unions/
    * exceptAll) rather than a single relation whose leaf could be
    * re-tagged: the batch plan's lazily-planned RDD becomes the leaf of
    * an `isStreaming=true` LogicalRDD (the same move Kafka's source
    * makes with its per-batch RDD).
    */
  def internalCreateStreamingDataFrame(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** DataFrame over a hand-built logical plan — the constructor a custom
    * LogicalPlan node (e.g. [[graft.plans.AsOfJoinNode]]) needs, hidden
    * behind `private[sql]` as `classic.Dataset.ofRows` in Spark 4.
    */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan):
      org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (child material for a
    * custom binary node).
    */
  def analyzedPlan(df: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
  }
}
