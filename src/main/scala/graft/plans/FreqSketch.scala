package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequency sketch (Misra & Gries 1982; the mergeable
  * "summary" form of Agarwal et al. 2012): at most k counters per
  * buffer; an incoming item either bumps its counter, claims a free
  * slot, or decrements everyone (the classic majority-vote
  * generalization). Merge sums counters then re-prunes to k by
  * subtracting the (k+1)-th largest count — which preserves the
  * guarantee: any item with true frequency > N/(k+1) is STILL PRESENT
  * in the merged sketch (undercounted, never evicted to zero silently).
  *
  * The sketch alone is merge-order-dependent (counts differ by merge
  * path), so it is NOT the query answer: [[FreqSketchAgg.heavyHitters]]
  * uses it only as a candidate generator (a ≤k-item superset of the
  * true heavy hitters) and re-counts candidates EXACTLY in a second
  * pass — the final output is deterministic and oracle-checkable, while
  * the shuffle never carries more than k (item, count) pairs per
  * partition. That two-phase shape (sketch → exact verify of a bounded
  * candidate set) is the same contract as the LSH→exact-cosine and
  * MinHash→exact-Jaccard paths in this repo.
  */
case class FreqSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(k >= 1, s"freq sketch needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "mg_heavy_candidates"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  /** Decrement every counter by `d`, dropping non-positive ones. */
  private def spend(buf: java.util.HashMap[String, Long], d: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= d) it.remove() else e.setValue(e.getValue - d)
    }
  }

  override def update(
      buf: java.util.HashMap[String, Long], input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      val cur = buf.getOrDefault(s, 0L)
      if (cur > 0L) buf.put(s, cur + 1)
      else if (buf.size < k) buf.put(s, 1L)
      else spend(buf, 1L)
    }
    buf
  }

  override def merge(
      buf: java.util.HashMap[String, Long],
      other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.merge(e.getKey, e.getValue, (a, b) => a + b)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count; ≤k strictly-larger survive
      val counts = new Array[Long](buf.size)
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      spend(buf, counts(buf.size - k - 1))
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val keys = new Array[AnyRef](buf.size)
    var i = 0
    val it = buf.keySet().iterator()
    while (it.hasNext) { keys(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(keys)
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey); out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < n) { val key = in.readUTF(); m.put(key, in.readLong()); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object FreqSketchAgg {
  import org.apache.spark.sql.functions._

  /** Candidate heavy items (array<string>, ≤k of them). */
  def mgCandidates(v: Column, k: Int): Column =
    SqlBridge.column(
      FreqSketchAgg(SqlBridge.expression(v.cast("string")), k).toAggregateExpression())

  /** Exact heavy hitters of `valueCol`: every value whose share of rows
    * is ≥ `minShare`, with exact count and share. Two phases: (1) one
    * pass building the MG candidate superset (k = ⌈2/minShare⌉ ≥
    * 1/minShare guarantees zero false negatives) alongside the exact
    * row total, (2) a broadcast semi-filter + exact count of candidates
    * only. Shuffle volume: ≤k candidate strings (phase 1 sketches merge
    * map-side), then counts for candidate rows only — never a full
    * `groupBy(value)` of the long tail.
    */
  def heavyHitters(df: DataFrame, valueCol: Column, minShare: Double): DataFrame = {
    require(minShare > 0.0 && minShare <= 1.0, s"bad minShare $minShare")
    val k = math.max(math.ceil(2.0 / minShare).toInt, 8)
    val head = df.agg(
      mgCandidates(valueCol, k).as("cand"),
      count(valueCol).as("n")).head
    val n = head.getAs[Long]("n")
    val cand = head.getSeq[String](0)
    val spark = df.sparkSession
    import spark.implicits._
    val candDf = cand.toDF("value")
    df.select(valueCol.cast("string").as("value"))
      .join(broadcast(candDf), Seq("value"), "left_semi")
      .groupBy($"value")
      .agg(count(lit(1)).as("cnt"))
      .filter($"cnt" >= lit(minShare) * n)
      .withColumn("share", $"cnt".cast("double") / n.toDouble)
  }

  /** PER-GROUP exact heavy hitters: values whose share WITHIN their
    * group is ≥ `minShare`. Same two-phase shape as [[heavyHitters]],
    * but the candidate supersets stay distributed — one `groupBy(grp)`
    * builds an MG sketch + exact total per group (≤k strings each,
    * map-side partial merges), candidates explode to a (grp, value)
    * broadcast semi-filter, and only candidate rows are re-counted. No
    * driver-side collect at all, so the group count can itself be large
    * (per-domain vocabularies over a TB corpus); the per-group MG bound
    * (k ≥ 2/minShare) makes false negatives impossible per group.
    */
  def heavyHittersBy(df: DataFrame, groupCol: Column, valueCol: Column,
      minShare: Double): DataFrame = {
    require(minShare > 0.0 && minShare <= 1.0, s"bad minShare $minShare")
    val k = math.max(math.ceil(2.0 / minShare).toInt, 8)
    val perGroup = df.groupBy(groupCol.as("grp"))
      .agg(mgCandidates(valueCol, k).as("cand"), count(valueCol).as("n"))
    val candDf = perGroup.select(col("grp"), explode(col("cand")).as("value"))
    df.select(groupCol.as("grp"), valueCol.cast("string").as("value"))
      .join(broadcast(candDf), Seq("grp", "value"), "left_semi")
      .groupBy(col("grp"), col("value"))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(perGroup.select(col("grp"), col("n"))), Seq("grp"))
      .filter(col("cnt") >= lit(minShare) * col("n"))
      .select(col("grp"), col("value"), col("cnt"),
        (col("cnt").cast("double") / col("n").cast("double")).as("share"))
  }
}
