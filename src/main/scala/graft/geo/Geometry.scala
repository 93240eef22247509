package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

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
}
