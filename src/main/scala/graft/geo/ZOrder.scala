package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Z-order (Morton) clustering key for multi-dimensional data skipping —
  * the production-scale layout for spatial point tables (SURVEY §2.3 J4
  * production path): sorting by an interleaved key gives parquet row
  * groups tight min/max ranges on BOTH lon and lat, so box queries skip
  * on both predicates instead of only the leading sort column.
  */
object ZOrder {

  /** Interleave two ≤31-bit quantized values into one Morton code
    * (1-bit spacing; x at even bit positions, y at odd).
    */
  def interleave(x: Long, y: Long): Long = {
    def spread(v: Long): Long = {
      var r = v & 0x7fffffffL
      r = (r | (r << 16)) & 0x0000ffff0000ffffL
      r = (r | (r << 8)) & 0x00ff00ff00ff00ffL
      r = (r | (r << 4)) & 0x0f0f0f0f0f0f0f0fL
      r = (r | (r << 2)) & 0x3333333333333333L
      r = (r | (r << 1)) & 0x5555555555555555L
      r
    }
    spread(x) | (spread(y) << 1)
  }

  /** Quantize a coordinate in [min, max] to `bits` and return the lattice
    * index (clamped).
    */
  def quantize(v: Double, min: Double, max: Double, bits: Int = 21): Long = {
    val cells = (1L << bits) - 1
    val t = (v - min) / (max - min)
    math.max(0L, math.min(cells, (t * cells).toLong))
  }

  /** Column form: Morton key of (x, y) over a fixed bounding box. Used as
    * a write-time sort key, not in query plans — a UDF is fine here.
    */
  def mortonKey(xMin: Double, xMax: Double, yMin: Double, yMax: Double): (Column, Column) => Column = {
    val u = udf((x: Double, y: Double) =>
      interleave(quantize(x, xMin, xMax), quantize(y, yMin, yMax)))
    (x: Column, y: Column) => u(x, y)
  }
}
