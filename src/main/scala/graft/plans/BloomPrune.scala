package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-pruned semi join — the shuffle-avoidance pattern behind Spark's
  * own runtime row-level filtering (`InjectRuntimeFilter`), surfaced as an
  * explicit operator so the build side, fpp and key can be chosen by the
  * caller rather than the optimizer's size thresholds.
  *
  * At 100 TB the cost of `big ⋉ small` is shuffling `big`; rows that
  * cannot match are still hashed, serialized and sent. A bloom filter of
  * the small side's keys broadcast to `big`'s scan drops (1 − fpp) of the
  * non-matching rows BEFORE the exchange — map-side, inside whole-stage
  * codegen via [[BloomMightContainLong]] (no UDF boxing). The surviving
  * superset then flows into the ordinary semi join, which removes the
  * false positives, so the output is exactly the plain semi join (the
  * spec asserts equality and the q156 oracle hash-verifies it).
  */
object BloomPrune {

  /** `big ⋉ small` on long keys, bloom-pruned before the shuffle. */
  def semiJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val spark = big.sparkSession
    // One aggregate job over the (already small by contract) build side;
    // the filter object is a few MB at 1M keys / 1% fpp.
    val bf = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    val bcast = spark.sparkContext.broadcast(bf)
    val pruned = big.filter(mightContainLong(bcast, col(bigKey)))
    pruned.join(
      small.select(col(smallKey).as(bigKey)).distinct(), Seq(bigKey), "left_semi")
  }

  def mightContainLong(bf: Broadcast[BloomFilter], key: Column): Column =
    SqlBridge.column(BloomMightContainLong(SqlBridge.expression(key), bf))
}

/** `bf.mightContainLong(child)` as a codegen'd Catalyst expression: the
  * broadcast filter is attached as a codegen reference object, so the
  * probe is a couple of hash ops inside the generated scan loop — this is
  * what keeps the prune genuinely map-side instead of a boxed UDF call
  * per row.
  */
case class BloomMightContainLong(child: Expression, bf: Broadcast[BloomFilter])
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(v: Any): Any =
    bf.value.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloomFilter", bf,
      classOf[Broadcast[BloomFilter]].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = ((org.apache.spark.util.sketch.BloomFilter) $bfRef.value()).mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
