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

  /** (cx, cy, cluster, n) for every core cell. */
  def gridDensity(
      points: DataFrame,
      xCol: String,
      yCol: String,
      cellSize: Long,
      minPts: Long): DataFrame = {
    require(cellSize > 0 && minPts > 0)
    val cells = points
      .select(
        expr(s"CAST($xCol AS BIGINT) div $cellSize").as("cx"),
        expr(s"CAST($yCol AS BIGINT) div $cellSize").as("cy"))
      .groupBy(col("cx"), col("cy"))
      .agg(count(lit(1)).as("n"))
    val dense = cells.filter(col("n") >= minPts)
      .withColumn("id", col("cx") * 1000000L + col("cy"))
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
