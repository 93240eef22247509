package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch as a typed imperative
  * aggregate — the mergeable synopsis of Bar-Yossef et al. 2002 /
  * Beyer et al. 2007 ("On synopses for distinct value estimation"):
  * keep the k smallest distinct values of a uniform hash; with the k-th
  * smallest normalized to u ∈ (0,1), the unbiased estimate is (k−1)/u.
  * Groups with fewer than k distinct hashes are EXACT (the sketch holds
  * them all).
  *
  * The scale contract (why not `count(distinct)`): per-group state is
  * bounded at k longs NO MATTER the group's cardinality, the buffer
  * participates in map-side partial aggregation, and merge is a k-way
  * min-union — so a billion-key group costs k·8 bytes per partition and
  * one shuffle of one sketch per (group, partition), where exact
  * distinct shuffles every distinct value. Same shape Spark's own HLL++
  * (`approx_count_distinct`) uses, but KMV over an md5-derived u32 is
  * *engine-portable*: the estimate replays bit-for-bit in any SQL engine
  * (md5 + ORDER BY + one division), so the approximate answer itself is
  * oracle-checkable — HLL's xxhash64/dense-register internals are not.
  *
  * Input: the already-hashed u32 (see [[KmvSketchAgg.kmvEstimate]] for
  * the canonical hashing recipe). Output: the (k−1)/u estimate as a
  * double, null on empty input.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  require(k >= 2, s"kmv needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  private def add(buf: java.util.TreeSet[Long], h: Long): Unit = {
    buf.add(h)
    if (buf.size > k) buf.pollLast()
  }

  override def update(
      buf: java.util.TreeSet[Long], input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[Long], other: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[Long]): Any =
    if (buf.isEmpty) null
    else if (buf.size < k) buf.size.toDouble
    else ((k - 1) * 4294967296.0) / buf.last().toDouble

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KmvSketchAgg {
  import org.apache.spark.sql.functions._

  /** The engine-portable u32 hash this sketch is defined over: first 8
    * hex digits of md5 of the value's string form (the same recipe as
    * [[graft.operators.TrainingPrep]]'s sampling hash, so one SQL
    * replay pattern covers both).
    */
  def u32(v: Column): Column =
    conv(substring(md5(v.cast("string")), 1, 8), 16, 10).cast("long")

  /** `kmvEstimate($"user_id", 256)` — distinct-count estimate with
    * k-bounded state; exact below k distinct values.
    */
  def kmvEstimate(v: Column, k: Int): Column =
    SqlBridge.column(
      KmvSketchAgg(SqlBridge.expression(u32(v)), k).toAggregateExpression())
}
