package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression for the similarity hot path: float32 dot
  * product over `array<float>` embedding columns, with whole-stage codegen
  * (`doGenCode`) so the inner loop runs inside Tungsten with no UDF
  * boxing, no lambda dispatch, and no per-row array allocation — the
  * difference between this and `aggregate(zip_with(...))` is ~one object
  * allocation + N closure calls per row pair, which dominates at
  * 100 TB-scale ANN sweeps.
  *
  * Accumulation is float32 in index order — the convention of columnar
  * vector kernels (e.g. DuckDB's list_dot_product, FAISS's default float
  * path), which also makes results bit-reproducible against the DuckDB
  * oracle. At 64-1024 dims the precision loss vs a double accumulator is
  * ~1e-4 relative — irrelevant for neighbor ranking.
  */
case class FloatDotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = FloatType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0f
    var i = 0
    while (i < n) {
      s += a.getFloat(i) * b.getFloat(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |float $s = 0.0f;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getFloat($i) * $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All LSH band buckets of a float vector in ONE expression: bucket b =
  * the `bitsPerBand` sign bits of Rademacher projections p = seed +
  * b·bitsPerBand + r, where plane element i of projection p is ±1 by the
  * same Knuth multiplicative hash as [[graft.operators.Similarity.pmPlane]]
  * — bit-identical to folding 128 separate `vec_dot(v, lit(plane))` CASE
  * columns (±1f multiplication is exact sign flip, float32 index-order
  * accumulation), but with the planes derived ARITHMETICALLY inside one
  * fused loop. The point is plan size: the unfused formulation is
  * nBands·bitsPerBand expression subtrees each dragging a dim-element
  * literal array — megabytes of plan text that Catalyst re-analyzes and
  * Janino re-compiles on every run, which at small candidate volumes
  * dominates the whole near-dup query.
  */
case class SignBuckets(child: Expression, seed: Int, bitsPerBand: Int, nBands: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "sign_buckets"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Int](nBands)
    var b = 0
    while (b < nBands) {
      var bucket = 0
      var r = 0
      while (r < bitsPerBand) {
        val p97 = (seed + b * bitsPerBand + r) * 97
        var s = 0.0f
        var i = 0
        while (i < n) {
          val pos = ((p97 + i).toLong * 2654435761L) % 4294967296L >= 2147483648L
          s += (if (pos) v.getFloat(i) else -v.getFloat(i))
          i += 1
        }
        if (s > 0f) bucket |= 1 << r
        r += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val i = ctx.freshName("i")
      val p97 = ctx.freshName("p97")
      val s = ctx.freshName("s")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = $v.numElements();
         |int[] $out = new int[$nBands];
         |for (int $b = 0; $b < $nBands; $b++) {
         |  int $bucket = 0;
         |  for (int $r = 0; $r < $bitsPerBand; $r++) {
         |    int $p97 = ($seed + $b * $bitsPerBand + $r) * 97;
         |    float $s = 0.0f;
         |    for (int $i = 0; $i < $n; $i++) {
         |      boolean pos = ((long)($p97 + $i)) * 2654435761L % 4294967296L >= 2147483648L;
         |      $s += pos ? $v.getFloat($i) : -$v.getFloat($i);
         |    }
         |    if ($s > 0.0f) $bucket |= (1 << $r);
         |  }
         |  $out[$b] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  /** float32 dot product of two array<float> columns (codegen'd). */
  def vecDot(a: Column, b: Column): Column =
    SqlBridge.column(
      FloatDotProduct(SqlBridge.expression(a), SqlBridge.expression(b)))

  /** cosine similarity: float dots widened to double for the final
    * sqrt/divide (exact-rounded, so still cross-engine deterministic).
    */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    vecDot(a, b).cast("double") / (normA * normB)

  /** L2 norm as double. */
  def vecNorm(a: Column): Column = {
    org.apache.spark.sql.functions.sqrt(vecDot(a, a).cast("double"))
  }

  /** All LSH band buckets (array<int>, one per band) in one fused pass. */
  def signBuckets(v: Column, seed: Int, bitsPerBand: Int, nBands: Int): Column =
    SqlBridge.column(SignBuckets(SqlBridge.expression(v), seed, bitsPerBand, nBands))

  /** Register `vec_dot` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    SqlBridge.registerFunction(spark, "vec_dot",
      exprs => FloatDotProduct(exprs.head, exprs(1)))
}
