package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Density-based spatial clustering, grid-quantized (the scalable DBSCAN
  * family member: cells of side `cellSize` stand in for the ε-ball, a
  * cell is "core" when it holds ≥ `minPts` points, clusters are
  * connected components over 8-adjacent core cells).
  *
  * Every step is partitionable:
  *  - cell assignment + counting: ONE map-side-combined aggregate
  *  - adjacency: the 8 neighbor offsets EXPLODE on one side and the
  *    join is a plain equi-join on the shifted cell key — no band/theta
  *    join, no planar index
  *  - components: the engine's pointer-jump CC (O(log diameter) rounds)
  *
  * Cluster id = the component's minimum cell id (isolated core cells
  * label themselves), which is what lets a recursive-CTE oracle replay
  * the whole clustering exactly.
  */
object Cluster {

  /** (cx, cy, cluster, n) for every core cell.
    *
    * Cell indices use FLOOR division (negative coordinates land in the
    * cell below zero, matching SQL `//`), and the cell id packs
    * `(cx << 32) | (cy & 0xffffffff)` — collision-free for any
    * |cx|,|cy| < 2³¹, unlike a decimal-shift pack which silently merges
    * cells once |cy| reaches the shift or coordinates mix signs.
    */
  def gridDensity(
      points: DataFrame,
      xCol: String,
      yCol: String,
      cellSize: Long,
      minPts: Long): DataFrame = {
    require(cellSize > 0 && minPts > 0)
    // floor division for a positive divisor: truncate, then step down
    // when the remainder is negative (Spark's div/% truncate toward 0)
    def floorDiv(c: String) =
      expr(s"CAST($c AS BIGINT) div $cellSize - " +
        s"(CASE WHEN CAST($c AS BIGINT) % $cellSize < 0 THEN 1 ELSE 0 END)")
    val cells = points
      .select(floorDiv(xCol).as("cx"), floorDiv(yCol).as("cy"))
      .groupBy(col("cx"), col("cy"))
      .agg(count(lit(1)).as("n"))
    val dense = cells.filter(col("n") >= minPts)
      .withColumn("id", expr("shiftleft(cx, 32) | (cy & 4294967295)"))
    val offsets = for { dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0 }
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
    val shifted = dense.select(col("id"), col("cx"), col("cy"))
      .withColumn("o", explode(array(offsets: _*)))
      .select(col("id").as("id_a"),
        (col("cx") + col("o.dx")).as("ncx"),
        (col("cy") + col("o.dy")).as("ncy"))
    val pairs = shifted.join(
        dense.select(col("id").as("id_b"), col("cx").as("ncx"), col("cy").as("ncy")),
        Seq("ncx", "ncy"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val cc = Dedup.connectedComponents(pairs)
    dense.join(cc.select(col("id"), col("cluster")), Seq("id"), "left")
      .select(col("cx"), col("cy"),
        coalesce(col("cluster"), col("id")).as("cluster"), col("n"))
  }
}
