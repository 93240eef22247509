package graft.geo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Minimal pure-Scala planar geometry for the spatial joins the reference
  * does with shapely/geopandas:
  *  - J4 polygon-contains-point sjoin
  *    (/root/reference/data/src/create_cenloc.py:91);
  *  - J5 point-within-(buffered)-polygon filter
  *    (/root/reference/data/src/create_destpoint.py:63-71).
  *
  * A [[Polygon]] is a list of (closed or open) rings of (x, y) vertices:
  * ring 0 is the outer boundary, later rings are holes — or, for
  * multi-part geometries (the general TIGER/CB case: states with islands,
  * tracts with lakes), any mix of disjoint outer rings and holes.
  * Containment is even-odd ray casting over ALL rings, which classifies
  * holes, islands, and islands-inside-holes correctly without needing to
  * know which ring plays which role. Exact for points strictly
  * inside/outside; callers must keep query points off edges (our fixtures
  * guarantee this; see FIXTURES.md §B9).
  */
object Geometry {

  final case class Polygon(rings: Array[Array[(Double, Double)]]) {

    /** Outer ring (ring 0) — the single-ring accessor. */
    def ring: Array[(Double, Double)] = rings.head

    /** Even-odd ray cast over all rings: a point is inside iff a ray to
      * +∞ crosses an odd number of ring edges in total. A crossing of a
      * hole ring flips the parity back out; a second disjoint part flips
      * it in again — both for free.
      */
    def contains(x: Double, y: Double): Boolean = {
      var inside = false
      var r = 0
      while (r < rings.length) {
        val rg = rings(r)
        var i = 0
        var j = rg.length - 1
        while (i < rg.length) {
          val (xi, yi) = rg(i)
          val (xj, yj) = rg(j)
          if ((yi > y) != (yj > y) &&
            x < (xj - xi) * (y - yi) / (yj - yi) + xi) inside = !inside
          j = i
          i += 1
        }
        r += 1
      }
      inside
    }

    /** (xmin, ymin, xmax, ymax) over all parts and holes. */
    def bbox: (Double, Double, Double, Double) = {
      var xmin = Double.MaxValue; var ymin = Double.MaxValue
      var xmax = Double.MinValue; var ymax = Double.MinValue
      rings.foreach(_.foreach { case (x, y) =>
        if (x < xmin) xmin = x; if (y < ymin) ymin = y
        if (x > xmax) xmax = x; if (y > ymax) ymax = y
      })
      (xmin, ymin, xmax, ymax)
    }

    /** Positive buffer by parallel edge offset with miter joins — valid
      * for simple (non-self-intersecting) convex OR concave rings, the
      * semantics of the reference's shapely
      * `boundary.buffer(dist)` (create_destpoint.py:57-59) up to corner
      * rounding: shapely rounds convex corners, the miter extends them
      * (both contain the true offset region; fixtures keep probe points
      * away from the corner arcs). Ring 0 grows outward; hole rings
      * shrink inward (the solid region gains `dist` everywhere). A miter
      * limit of 8·dist caps spike vertices (nearly-reversing edges) at a
      * bevel-style bisector offset instead of a point at infinity.
      */
    def buffer(dist: Double): Polygon =
      Polygon(rings.zipWithIndex.map { case (r, i) =>
        offsetRing(r, if (i == 0) dist else -dist)
      })

    private def offsetRing(
        ringIn: Array[(Double, Double)], dist: Double): Array[(Double, Double)] = {
      val closed = ringIn.length > 1 && ringIn.head == ringIn.last
      val vs = if (closed) ringIn.dropRight(1) else ringIn
      val n = vs.length
      var area2 = 0.0
      var i = 0
      while (i < n) {
        val (x1, y1) = vs(i); val (x2, y2) = vs((i + 1) % n)
        area2 += x1 * y2 - x2 * y1
        i += 1
      }
      // CCW ring (area2 > 0): outward unit normal of edge dir (dx,dy) is
      // (dy,-dx); CW flips. `sign` folds orientation into the normal so
      // positive dist always moves edges away from the enclosed area.
      val sign = if (area2 >= 0) 1.0 else -1.0
      def normal(a: (Double, Double), b: (Double, Double)): (Double, Double) = {
        val dx = b._1 - a._1; val dy = b._2 - a._2
        val l = math.hypot(dx, dy)
        (sign * dy / l * dist, -sign * dx / l * dist)
      }
      val out = Array.ofDim[(Double, Double)](n)
      i = 0
      while (i < n) {
        val p = vs((i - 1 + n) % n); val v = vs(i); val q = vs((i + 1) % n)
        val (n1x, n1y) = normal(p, v)
        val (n2x, n2y) = normal(v, q)
        val d1x = v._1 - p._1; val d1y = v._2 - p._2
        val d2x = q._1 - v._1; val d2y = q._2 - v._2
        val cross = d1x * d2y - d1y * d2x
        val bevel = {
          // angle-bisector fallback: average of the two edge normals
          // (already orientation- and sign-of-dist-correct), rescaled to
          // |dist|
          val bx = (n1x + n2x) / 2; val by = (n1y + n2y) / 2
          val bl = math.hypot(bx, by)
          if (bl == 0) (v._1 + n1x, v._2 + n1y)
          else (v._1 + bx / bl * math.abs(dist), v._2 + by / bl * math.abs(dist))
        }
        if (math.abs(cross) < 1e-12 * (math.hypot(d1x, d1y) * math.hypot(d2x, d2y))) {
          // collinear edges: plain perpendicular offset
          out(i) = (v._1 + n1x, v._2 + n1y)
        } else {
          // miter: intersection of the two offset edge lines
          val p1x = p._1 + n1x; val p1y = p._2 + n1y
          val p2x = v._1 + n2x; val p2y = v._2 + n2y
          val t = ((p2x - p1x) * d2y - (p2y - p1y) * d2x) / cross
          val mx = p1x + t * d1x; val my = p1y + t * d1y
          val ml = math.hypot(mx - v._1, my - v._2)
          out(i) = if (ml > 8.0 * math.abs(dist)) bevel else (mx, my)
        }
        i += 1
      }
      if (closed) out :+ out(0) else out
    }

    /** Clip to an axis-aligned bbox — F13, the reference's dateline guard
      * (`create_osmclip.py:50-54` intersects the boundary with a large
      * box before reprojecting). Each ring is clipped independently by
      * [[clipConvex]]; axis-parallel clip edges make every intersection
      * coordinate an exact clamp (no interpolation dust), so rectangular
      * inputs clip to bit-exact rectangles (the q100 oracle relies on
      * this).
      */
    def clipBbox(xmin: Double, ymin: Double, xmax: Double, ymax: Double): Polygon =
      clipConvex(Array((xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax)))

    /** Sutherland–Hodgman clip of every ring against a CONVEX clip ring
      * (any orientation; reoriented to CCW internally). Rings are clipped
      * independently — correct for even-odd containment as long as holes
      * lie inside their outer ring, which TIGER/CB geometry guarantees.
      * Rings fully outside drop out; a fully-clipped polygon has zero
      * rings. Points exactly ON a clip edge count as inside, so shared
      * boundaries don't open gaps.
      */
    def clipConvex(clipRingIn: Array[(Double, Double)]): Polygon = {
      val cr0 = if (clipRingIn.length > 1 && clipRingIn.head == clipRingIn.last)
        clipRingIn.dropRight(1) else clipRingIn
      var a2 = 0.0
      var k = 0
      while (k < cr0.length) {
        val (x1, y1) = cr0(k); val (x2, y2) = cr0((k + 1) % cr0.length)
        a2 += x1 * y2 - x2 * y1
        k += 1
      }
      val cr = if (a2 >= 0) cr0 else cr0.reverse
      val outRings = rings.flatMap { ringIn =>
        val closed = ringIn.length > 1 && ringIn.head == ringIn.last
        var subject = if (closed) ringIn.dropRight(1) else ringIn
        var e = 0
        while (e < cr.length && subject.length >= 3) {
          val a = cr(e); val b = cr((e + 1) % cr.length)
          subject = clipHalfPlane(subject, a, b)
          e += 1
        }
        // S-H emits a duplicate when a vertex lies exactly on a clip edge
        // — drop consecutive (and cyclic first==last) repeats
        val dedup = subject.indices.collect {
          case i if subject(i) != subject((i + 1) % subject.length) => subject(i)
        }.toArray
        if (dedup.length < 3) None
        else Some(if (closed) dedup :+ dedup(0) else dedup)
      }
      Polygon(outRings)
    }

    /** Keep the part of `vs` on the left of directed edge a→b (CCW clip
      * ring ⇒ left = inside). Intersections on axis-parallel clip edges
      * snap the fixed coordinate exactly.
      */
    private def clipHalfPlane(
        vs: Array[(Double, Double)],
        a: (Double, Double), b: (Double, Double)): Array[(Double, Double)] = {
      val ex = b._1 - a._1; val ey = b._2 - a._2
      def side(p: (Double, Double)): Double = ex * (p._2 - a._2) - ey * (p._1 - a._1)
      def cross(p1: (Double, Double), p2: (Double, Double), s1: Double, s2: Double) = {
        val t = s1 / (s1 - s2)
        val ix = if (ex == 0) a._1 else p1._1 + t * (p2._1 - p1._1)
        val iy = if (ey == 0) a._2 else p1._2 + t * (p2._2 - p1._2)
        (ix, iy)
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
      var i = 0
      while (i < vs.length) {
        val cur = vs(i); val nxt = vs((i + 1) % vs.length)
        val sc = side(cur); val sn = side(nxt)
        if (sc >= 0) {
          out += cur
          if (sn < 0) out += cross(cur, nxt, sc, sn)
        } else if (sn >= 0) out += cross(cur, nxt, sc, sn)
        i += 1
      }
      out.toArray
    }
  }

  object Polygon {
    /** Single-ring constructor (the common fixture case). */
    def apply(ring: Array[(Double, Double)]): Polygon = Polygon(Array(ring))
  }

  /** Parse POLYGON (with optional hole rings) or MULTIPOLYGON WKT into a
    * flat ring list. Ring roles (outer / hole / disjoint part) need no
    * tagging — even-odd containment is role-agnostic. Matches what the
    * reference reads out of TIGER shapefiles via geopandas
    * (create_cenloc.py:91 consumes arbitrary shapely geometry).
    */
  def parseWkt(wkt: String): Polygon = {
    val body = wkt.trim
      .stripPrefix("MULTIPOLYGON").stripPrefix("POLYGON").trim
    // innermost parenthesized groups are exactly the rings, for both
    // POLYGON ((r1), (r2)) and MULTIPOLYGON (((r1), (r2)), ((r3)))
    val rings = "\\(([^()]+)\\)".r.findAllMatchIn(body).map { m =>
      m.group(1).split(",").map { pair =>
        val parts = pair.trim.split("\\s+")
        (parts(0).toDouble, parts(1).toDouble)
      }
    }.toArray
    require(rings.nonEmpty, s"no rings in WKT: ${wkt.take(80)}")
    Polygon(rings)
  }

  def rectWkt(xmin: Double, ymin: Double, xmax: Double, ymax: Double): String =
    s"POLYGON (($xmin $ymin, $xmax $ymin, $xmax $ymax, $xmin $ymax, $xmin $ymin))"

  /** Serialize a polygon back to WKT (single part with hole rings). */
  def toWkt(p: Polygon): String =
    p.rings.map(_.map { case (x, y) => s"$x $y" }.mkString("(", ", ", ")"))
      .mkString("POLYGON (", ", ", ")")

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
    * bbox (all parts and holes); points compute their single cell;
    * candidates come from an EQUI-JOIN on the cell key
    * (hash-partitionable, never a nested-loop or per-row polygon scan);
    * the exact even-odd `contains` test then refines candidates only.
    * Per-point candidate count is bounded by polygons-per-cell, so refine
    * cost is O(points × local density), not O(points × |polygons|).
    * First-match semantics (lowest `prio` wins, parity with
    * [[assignUdf]]'s `find`) resolve overlaps with a `min_by` aggregation
    * on the point key — ONE shuffle with map-side partial aggregation,
    * not a window over a max-cardinality partition key.
    *
    * `pointKey` names columns that uniquely identify a point row (cenloc
    * always has one — geoid); when absent a synthetic per-row id is used
    * (computed once, before the join, so task retries on the join side
    * cannot skew it).
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
      cellSize: Double,
      pointKey: Seq[String] = Nil): DataFrame = {
    val cs = lit(cellSize)
    val bboxU = udf { (w: String) =>
      val (xmin, ymin, xmax, ymax) = cachedParse(w).bbox
      Array(xmin, ymin, xmax, ymax)
    }
    val containsU = udf((w: String, x: Double, y: Double) => cachedParse(w).contains(x, y))

    val polyCells = polys
      .withColumn("__bb", bboxU(col("wkt")))
      .withColumn("__cx", explode(sequence(
        floor(col("__bb")(0) / cs).cast("long"), floor(col("__bb")(2) / cs).cast("long"))))
      .withColumn("__cy", explode(sequence(
        floor(col("__bb")(1) / cs).cast("long"), floor(col("__bb")(3) / cs).cast("long"))))
      .select(col("__cx"), col("__cy"), col("prio"), col("geoid"), col("wkt"))

    val ptCols = points.columns.toSeq
    val keyCols = if (pointKey.nonEmpty) pointKey else Seq("__rid")
    val keyed =
      if (pointKey.nonEmpty) points
      else points.withColumn("__rid", monotonically_increasing_id())
    val cells = keyed
      .withColumn("__cx", floor(xCol / cs).cast("long"))
      .withColumn("__cy", floor(yCol / cs).cast("long"))

    val valCols = ptCols.filterNot(keyCols.contains)
    cells.join(polyCells, Seq("__cx", "__cy"))
      .filter(containsU(col("wkt"), xCol, yCol))
      .groupBy(keyCols.map(col): _*)
      .agg(min_by(
        struct((valCols.map(col) :+ col("geoid")): _*), col("prio")).as("__m"))
      .select(ptCols.map(c =>
        if (keyCols.contains(c)) col(c) else col(s"__m.$c")) :+
        col("__m.geoid").as("geoid"): _*)
  }

  /** [[gridAssign]] over an in-memory (geoid, wkt) list; priority is the
    * list order, matching [[assignUdf]] exactly.
    */
  def gridAssign(
      points: DataFrame,
      xCol: Column,
      yCol: Column,
      polys: Seq[(String, String)],
      cellSize: Double,
      pointKey: Seq[String]): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val pdf = polys.zipWithIndex.map { case ((g, w), i) => (i, g, w) }
      .toDF("prio", "geoid", "wkt")
    gridAssign(points, xCol, yCol, pdf, cellSize, pointKey)
  }

  def gridAssign(
      points: DataFrame,
      xCol: Column,
      yCol: Column,
      polys: Seq[(String, String)],
      cellSize: Double): DataFrame =
    gridAssign(points, xCol, yCol, polys, cellSize, Nil)
}
