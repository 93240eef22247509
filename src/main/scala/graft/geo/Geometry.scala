package graft.geo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Minimal pure-Scala planar geometry for the spatial joins the reference
  * does with shapely/geopandas:
  *  - J4 polygon-contains-point sjoin
  *    (/root/reference/data/src/create_cenloc.py:91);
  *  - J5 point-within-(buffered)-polygon filter
  *    (/root/reference/data/src/create_destpoint.py:63-71).
  *
  * Polygons are (closed) rings of (x, y) vertices, parsed from WKT
  * POLYGON text. Containment is even-odd ray casting — exact for points
  * strictly inside/outside; callers must keep query points off edges
  * (our fixtures guarantee this; see FIXTURES.md §B9).
  */
object Geometry {

  final case class Polygon(ring: Array[(Double, Double)]) {
    def contains(x: Double, y: Double): Boolean = {
      var inside = false
      var i = 0
      var j = ring.length - 1
      while (i < ring.length) {
        val (xi, yi) = ring(i)
        val (xj, yj) = ring(j)
        if ((yi > y) != (yj > y) &&
          x < (xj - xi) * (y - yi) / (yj - yi) + xi) inside = !inside
        j = i
        i += 1
      }
      inside
    }

    /** Minkowski-ish buffer for convex rings: offsets each vertex outward
      * from the centroid by `dist` (adequate for the rectangular state
      * boundaries in fixtures; the reference buffers with shapely,
      * create_destpoint.py:57-59 — a driver-side, single-polygon op).
      */
    def buffer(dist: Double): Polygon = {
      val cx = ring.map(_._1).sum / ring.length
      val cy = ring.map(_._2).sum / ring.length
      Polygon(ring.map { case (x, y) =>
        val dx = x - cx; val dy = y - cy
        val d = math.sqrt(dx * dx + dy * dy)
        if (d == 0) (x, y) else (x + dx / d * dist, y + dy / d * dist)
      })
    }
  }

  /** Parse `POLYGON ((x y, x y, ...))` WKT (outer ring only). */
  def parseWkt(wkt: String): Polygon = {
    val inner = wkt.trim
      .stripPrefix("POLYGON").trim
      .stripPrefix("((").stripSuffix("))")
    Polygon(inner.split(",").map { pair =>
      val parts = pair.trim.split("\\s+")
      (parts(0).toDouble, parts(1).toDouble)
    })
  }

  def rectWkt(xmin: Double, ymin: Double, xmax: Double, ymax: Double): String =
    s"POLYGON (($xmin $ymin, $xmax $ymin, $xmax $ymax, $xmin $ymax, $xmin $ymin))"

  /** Broadcast-side spatial assignment (J4 as a broadcast + UDF plan —
    * SURVEY §7.3): given small (geoid → polygon) pairs, returns a column
    * mapping each point to the first containing polygon's geoid, else
    * null. At production polygon counts this becomes a grid-bucketed
    * equi-join prefilter + exact refine; broadcast-UDF is the correct
    * plan while the polygon side fits in memory (it broadcasts once per
    * executor, no shuffle of the point side).
    */
  def assignUdf(polys: Seq[(String, String)]): (Column, Column) => Column = {
    val parsed = polys.map { case (g, w) => (g, parseWkt(w)) }.toArray
    val u = udf((x: Double, y: Double) => {
      val hit = parsed.find(_._2.contains(x, y))
      hit.map(_._1).orNull
    })
    (x: Column, y: Column) => u(x, y)
  }

  /** Executor-local WKT parse cache: the grid-join refine step sees the
    * same polygon text once per candidate row; parsing is amortized to
    * once per (executor, polygon).
    */
  private val wktCache =
    new java.util.concurrent.ConcurrentHashMap[String, Polygon]()
  private def cachedParse(w: String): Polygon =
    wktCache.computeIfAbsent(w, parseWkt(_))

  /** Grid-bucketed spatial join — the scale path for J4 (the reference
    * runs its rtree sjoin over 240k+ TIGER polygons,
    * /root/reference/data/src/create_cenloc.py:91; a broadcast linear
    * scan does not survive that).
    *
    * Plan shape: polygons explode to the grid cells covered by their
    * bbox; points compute their single cell; candidates come from an
    * EQUI-JOIN on the cell key (hash-partitionable, never a nested-loop
    * or per-row polygon scan); the exact even-odd `contains` test then
    * refines candidates only. Per-point candidate count is bounded by
    * polygons-per-cell, so refine cost is O(points × local density), not
    * O(points × |polygons|). First-match semantics (lowest `prio` wins,
    * parity with [[assignUdf]]'s `find`) resolve overlaps via a
    * per-point window over the few candidate rows.
    *
    * `polys` columns: (prio int, geoid string, wkt string). Returns the
    * point rows that fall in some polygon, with a `geoid` column
    * appended (inner-join semantics; the J4 sjoin is inner too).
    */
  def gridAssign(
      points: DataFrame,
      xCol: Column,
      yCol: Column,
      polys: DataFrame,
      cellSize: Double): DataFrame = {
    val cs = lit(cellSize)
    val bboxU = udf { (w: String) =>
      val r = cachedParse(w).ring
      Array(r.map(_._1).min, r.map(_._2).min, r.map(_._1).max, r.map(_._2).max)
    }
    val containsU = udf((w: String, x: Double, y: Double) => cachedParse(w).contains(x, y))

    val polyCells = polys
      .withColumn("__bb", bboxU(col("wkt")))
      .withColumn("__cx", explode(sequence(
        floor(col("__bb")(0) / cs).cast("long"), floor(col("__bb")(2) / cs).cast("long"))))
      .withColumn("__cy", explode(sequence(
        floor(col("__bb")(1) / cs).cast("long"), floor(col("__bb")(3) / cs).cast("long"))))
      .select(col("__cx"), col("__cy"), col("prio"), col("geoid"), col("wkt"))

    val cells = points
      .withColumn("__rid", monotonically_increasing_id())
      .withColumn("__cx", floor(xCol / cs).cast("long"))
      .withColumn("__cy", floor(yCol / cs).cast("long"))

    val w = Window.partitionBy(col("__rid")).orderBy(col("prio"))
    cells.join(polyCells, Seq("__cx", "__cy"))
      .filter(containsU(col("wkt"), xCol, yCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__cx", "__cy", "__rid", "__rn", "prio", "wkt")
  }

  /** [[gridAssign]] over an in-memory (geoid, wkt) list; priority is the
    * list order, matching [[assignUdf]] exactly.
    */
  def gridAssign(
      points: DataFrame,
      xCol: Column,
      yCol: Column,
      polys: Seq[(String, String)],
      cellSize: Double): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val pdf = polys.zipWithIndex.map { case ((g, w), i) => (i, g, w) }
      .toDF("prio", "geoid", "wkt")
    gridAssign(points, xCol, yCol, pdf, cellSize)
  }
}
