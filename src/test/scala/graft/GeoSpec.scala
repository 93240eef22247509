package graft

import graft.geo.{Albers, Geometry}
import org.scalatest.funsuite.AnyFunSuite

class GeoSpec extends AnyFunSuite {
  import SparkTestSession._

  test("Albers: projection origin maps to (0, 0)") {
    val (x, y) = Albers.forward(-96.0, 23.0)
    assert(math.abs(x) < 1e-6 && math.abs(y) < 1e-6)
  }

  test("Albers: known CONUS point is in plausible EPSG:5071 range") {
    // Chicago-ish: EPSG:5071 puts CONUS x in ~[-2.4e6, 2.3e6], y in [0, 3.2e6]
    val (x, y) = Albers.forward(-87.63, 41.88)
    assert(x > 5e5 && x < 9e5, s"x=$x")
    assert(y > 2.0e6 && y < 2.4e6, s"y=$y")
  }

  test("Albers: roundtrip identity within 1e-8 degrees across CONUS + fixture range") {
    // deterministic lattice sweep (no scalacheck bridge in the offline cache)
    for (lon <- BigDecimal(-130.0) to 150.0 by 3.7; lat <- BigDecimal(20.0) to 55.0 by 1.9) {
      val (x, y) = Albers.forward(lon.toDouble, lat.toDouble)
      val (lon2, lat2) = Albers.inverse(x, y)
      assert(math.abs(lon2 - lon.toDouble) < 1e-8, s"lon $lon -> $lon2")
      assert(math.abs(lat2 - lat.toDouble) < 1e-8, s"lat $lat -> $lat2")
    }
  }

  test("Albers expression (codegen) equals the direct scala computation") {
    import SparkTestSession._
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.element_at
    val pts = Seq((-87.63, 41.88), (-96.0, 23.0), (-122.42, 37.77))
    val got = pts.toDF("lon", "lat")
      .withColumn("xy", Albers.fwd($"lon", $"lat"))
      .withColumn("ll", Albers.inv(element_at($"xy", 1), element_at($"xy", 2)))
      .select($"lon", $"lat",
        element_at($"xy", 1), element_at($"xy", 2),
        element_at($"ll", 1), element_at($"ll", 2))
      .collect()
    got.foreach { r =>
      val (x, y) = Albers.forward(r.getDouble(0), r.getDouble(1))
      assert(r.getDouble(2) == x && r.getDouble(3) == y, "forward mismatch vs scala path")
      assert(math.abs(r.getDouble(4) - r.getDouble(0)) < 1e-8)
      assert(math.abs(r.getDouble(5) - r.getDouble(1)) < 1e-8)
    }
    // the expression must also be SQL-registered via the extensions
    graft.plans.VectorFunctions.register(s)
    s.sql("SELECT vec_dot(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT)))").collect()
  }

  test("Albers: area distortion near standard parallels is ~zero (equal-area sanity)") {
    // at a standard parallel the local scale is 1: a small 0.01° box should
    // have area ≈ cos(lat) * (111.32 km)^2 * 1e-4
    val d = 0.01
    val (x1, y1) = Albers.forward(-100.0, 29.5)
    val (x2, y2) = Albers.forward(-100.0 + d, 29.5)
    val (x3, y3) = Albers.forward(-100.0, 29.5 + d)
    val area = math.abs((x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1))
    val expect = math.cos(math.toRadians(29.5)) * math.pow(111320.0 * d, 2)
    assert(math.abs(area / expect - 1.0) < 0.01, s"area=$area expect=$expect")
  }

  test("PIP: rectangle and concave polygon containment") {
    val rect = Geometry.parseWkt(Geometry.rectWkt(0, 0, 10, 10))
    assert(rect.contains(5, 5))
    assert(!rect.contains(15, 5))
    assert(!rect.contains(-1, -1))
    // concave "L" shape: (0,0)-(10,0)-(10,4)-(4,4)-(4,10)-(0,10)
    val ell = Geometry.Polygon(Array((0.0, 0.0), (10.0, 0.0), (10.0, 4.0), (4.0, 4.0), (4.0, 10.0), (0.0, 10.0), (0.0, 0.0)))
    assert(ell.contains(2, 8))   // in the vertical arm
    assert(ell.contains(8, 2))   // in the horizontal arm
    assert(!ell.contains(8, 8))  // in the notch
  }

  test("PIP: buffered polygon contains points outside the original (J5 semantics)") {
    val rect = Geometry.parseWkt(Geometry.rectWkt(0, 0, 10, 10))
    val buffered = rect.buffer(3.0)
    assert(!rect.contains(11.0, 5.0))
    assert(buffered.contains(11.0, 5.0))
    // miter buffer of an axis-aligned rect is EXACTLY the expanded rect,
    // corners included
    assert(buffered.contains(-2.9, -2.9))
    assert(!buffered.contains(-3.1, 5.0))
  }

  test("PIP: donut (hole ring) and multi-part containment via even-odd over all rings") {
    val donut = Geometry.parseWkt(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))")
    assert(donut.contains(1, 1))      // in the ring area
    assert(!donut.contains(5, 5))     // in the hole
    assert(donut.contains(3.5, 1.0))  // below the hole, still solid
    assert(!donut.contains(11, 5))    // outside

    val two = Geometry.parseWkt(
      "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), ((6 6, 9 6, 9 9, 6 9, 6 6)))")
    assert(two.contains(2, 2))
    assert(two.contains(7, 7))
    assert(!two.contains(5, 5))       // the gap between parts

    // island inside a lake: three nested rings, parity alternates
    val nested = Geometry.parseWkt(
      "POLYGON ((0 0, 12 0, 12 12, 0 12, 0 0), (2 2, 10 2, 10 10, 2 10, 2 2), (4 4, 8 4, 8 8, 4 8, 4 4))")
    assert(nested.contains(1, 1))     // mainland
    assert(!nested.contains(3, 3))    // lake
    assert(nested.contains(6, 6))     // island in the lake
    assert((two.bbox, nested.bbox) == (((0.0, 0.0, 9.0, 9.0)), ((0.0, 0.0, 12.0, 12.0))))
  }

  test("buffer: concave L offsets edges, not centroid rays (miter at the reflex corner)") {
    // L = [123,135]x[30,40] ∪ [123,130]x[30,44]; miter buffer 1.0 =
    // [122,136]x[29,41] ∪ [122,131]x[29,45]
    val ell = Geometry.Polygon(Array(
      (123.0, 30.0), (135.0, 30.0), (135.0, 40.0),
      (130.0, 40.0), (130.0, 44.0), (123.0, 44.0)))
    val b = ell.buffer(1.0)
    // near the right arm's far edge: inside the true offset region — a
    // centroid-ray vertex offset pulls this edge short and loses it
    assert(b.contains(135.8, 35.0))
    assert(b.contains(135.8, 40.8))   // expanded outer corner of the arm
    assert(!b.contains(136.2, 35.0))  // just past the offset edge
    assert(b.contains(130.8, 44.5))   // top arm's right edge moved to 131
    assert(!b.contains(131.5, 42.0))  // notch side: NOT buffered outward
    assert(b.contains(130.5, 40.5))   // reflex miter corner region is solid
    assert(!b.contains(122.0 - 0.2, 35.0))
    assert(b.contains(122.2, 29.2))
  }

  test("buffer: positive buffer shrinks holes (solid gains dist everywhere)") {
    val donut = Geometry.parseWkt(
      "POLYGON ((120 30, 130 30, 130 40, 120 40, 120 30), (124 33, 128 33, 128 37, 124 37, 124 33))")
    val b = donut.buffer(0.5)
    assert(!donut.contains(124.2, 35.0)) // in the original hole
    assert(b.contains(124.2, 35.0))      // hole shrank to [124.5,127.5]x[33.5,36.5]
    assert(!b.contains(126.0, 35.0))     // hole center still open
    assert(b.contains(130.3, 35.0))      // outer grew
  }

  test("grid join equals the broadcast linear scan at high polygon count (overlaps + concave)") {
    val s = spark
    import s.implicits._
    // 1600 unit squares + a higher-priority concave L overlapping them:
    // a polygon count where the O(|polys|)-per-row linear scan is visibly
    // the wrong plan and cell bucketing is the real path
    val grid = for { i <- 0 until 40; j <- 0 until 40 } yield
      (s"g${i}_$j", Geometry.rectWkt(i + 0.001, j + 0.001, i + 1.001, j + 1.001))
    val ell = "POLYGON ((5.001 5.001, 9.001 5.001, 9.001 6.501, 6.501 6.501, 6.501 9.001, 5.001 9.001, 5.001 5.001))"
    val polys = ("L0", ell) +: grid
    val pts = (0 until 5000)
      .map(k => (k.toLong, (k % 80) * 0.5 + 0.25, (k / 80 % 80) * 0.5 + 0.25))
      .toDF("pid", "x", "y")

    val expect = pts.withColumn("geoid", Geometry.assignUdf(polys)($"x", $"y"))
      .filter($"geoid".isNotNull)
      .select("pid", "geoid").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = Geometry.gridAssign(pts, $"x", $"y", polys, cellSize = 2.0)
      .select("pid", "geoid").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == expect)
    // natural-key variant (no synthetic row id at all) must agree
    val gotKeyed = Geometry.gridAssign(pts, $"x", $"y", polys, cellSize = 2.0,
        pointKey = Seq("pid"))
      .select("pid", "geoid").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gotKeyed == expect)
    // the overlap really exercised first-match priority, and the concave
    // notch fell through to the underlying square
    assert(got.values.exists(_ == "L0"))
    assert(got(expect.find(_._2 == "L0").get._1) == "L0")
  }

  // --- F13 bbox / convex clip (create_osmclip.py:50-54) ---------------

  private def shoelace(ring: Array[(Double, Double)]): Double = {
    val vs = if (ring.length > 1 && ring.head == ring.last) ring.dropRight(1) else ring
    math.abs(vs.indices.map { i =>
      val (x1, y1) = vs(i); val (x2, y2) = vs((i + 1) % vs.length)
      x1 * y2 - x2 * y1
    }.sum / 2)
  }

  test("clipBbox: concave L-shape clips to the exact intersection") {
    val l = Geometry.Polygon(Array(
      (0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (2.0, 2.0), (2.0, 4.0), (0.0, 4.0)))
    val c = l.clipBbox(1, 1, 3, 3)
    assert(c.rings.length == 1)
    // area of L ∩ [1,3]² = 2×2 square minus the 1×1 notch corner
    assert(math.abs(shoelace(c.ring) - 3.0) < 1e-12)
    assert(c.contains(1.5, 2.5))
    assert(!c.contains(2.5, 2.5)) // the notch survives the clip
    assert(!c.contains(3.5, 1.5)) // outside the bbox
  }

  test("clipBbox: donut keeps its hole through the clip (per-ring clipping)") {
    val donut = Geometry.Polygon(Array(
      Array((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)),
      Array((4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0))))
    val c = donut.clipBbox(-1, -1, 5, 5)
    assert(c.rings.length == 2)
    assert(c.contains(2.0, 2.0))
    assert(!c.contains(4.5, 4.5)) // inside the (clipped) hole
    assert(!c.contains(5.5, 2.0)) // clipped away
    // outer ring becomes [0,5]², hole corner [4,5]² → solid area 25 − 1
    assert(math.abs(shoelace(c.rings(0)) - shoelace(c.rings(1)) - 24.0) < 1e-12)
  }

  test("clipBbox: disjoint ring drops; fully-clipped polygon has zero rings") {
    val far = Geometry.Polygon(Array((100.0, 100.0), (110.0, 100.0), (110.0, 110.0), (100.0, 110.0)))
    assert(far.clipBbox(0, 0, 50, 50).rings.isEmpty)
    val multi = Geometry.Polygon(Array(
      Array((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)),
      Array((100.0, 100.0), (110.0, 100.0), (110.0, 110.0), (100.0, 110.0))))
    val c = multi.clipBbox(0, 0, 50, 50)
    assert(c.rings.length == 1 && math.abs(shoelace(c.ring) - 16.0) < 1e-12)
  }

  test("clipConvex: general convex window (diamond), any clip orientation") {
    val sq = Geometry.Polygon(Array((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)))
    val diamondCcw = Array((2.0, -1.0), (5.0, 2.0), (2.0, 5.0), (-1.0, 2.0))
    // square ∩ diamond: each square corner loses a ½-area triangle → 14
    val c1 = sq.clipConvex(diamondCcw)
    assert(math.abs(shoelace(c1.ring) - 14.0) < 1e-12)
    val c2 = sq.clipConvex(diamondCcw.reverse) // CW clip ring must work too
    assert(math.abs(shoelace(c2.ring) - 14.0) < 1e-12)
  }

  test("clipBbox: boundary-coincident edges are kept, not opened") {
    val sq = Geometry.Polygon(Array((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)))
    val c = sq.clipBbox(0, 0, 4, 4)
    assert(c.rings.length == 1 && math.abs(shoelace(c.ring) - 16.0) < 1e-12)
    // zero-width touch degenerates to nothing rather than a sliver
    assert(sq.clipBbox(4, 0, 8, 4).rings.isEmpty)
  }

  test("geoid split semantics (F3: 2/5/11/12/15-digit prefixes)") {
    val geoid = "170318391001234"
    assert(geoid.substring(0, 2) == "17")      // state
    assert(geoid.substring(2, 5) == "031")     // county
    assert(geoid.substring(5, 11) == "839100") // tract
    assert(geoid.substring(11, 12) == "1")     // block group
    assert(geoid.substring(11, 15) == "1234")  // block
  }
}
