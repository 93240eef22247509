package graft

import graft.geo.Tiles
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tile pyramid (q128/q129) — the in-engine tippecanoe-stage analog
  * (reference `data/src/create_tiles.sh`).
  */
class TilesSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def points(rows: (Long, Double, Double, Double)*) =
    rows.toDF("id", "lon", "lat", "weight")

  test("slippy tile math matches known anchors") {
    // (lon, lat, z) -> (x, y) anchors from the OSM slippy-map definition
    val anchors = Seq(
      (0.0, 0.0, 1, 1L, 1L),          // greenwich/equator → tile (1,1) at z1
      (-180.0, 85.0511287, 2, 0L, 0L), // top-left corner of the mercator world
      (-87.63, 41.88, 10, 262L, 380L), // chicago (osm wiki example math)
      (139.69, 35.68, 10, 909L, 403L)) // tokyo
    val df = anchors.zipWithIndex
      .map { case ((lon, lat, z, _, _), i) => (i, lon, lat, z) }
      .toDF("i", "lon", "lat", "z")
      .select($"i", Tiles.tileX($"lon", $"z").as("x"), Tiles.tileY($"lat", $"z").as("y"))
      .orderBy("i").collect()
    anchors.zipWithIndex.foreach { case ((_, _, _, ex, ey), i) =>
      assert(df(i).getLong(1) == ex && df(i).getLong(2) == ey,
        s"anchor $i: got (${df(i).getLong(1)},${df(i).getLong(2)}) want ($ex,$ey)")
    }
  }

  test("quadkey: z bits, base-4 digits, parent-prefix property") {
    val df = Seq((3L, 5L, 3), (0L, 0L, 1), (1L, 1L, 1))
      .toDF("x", "y", "z")
      .select(Tiles.quadkey($"x", $"y", $"z").as("qk")).collect()
    // x=3 (011), y=5 (101): digits MSB-first = (2*1+0, 2*0+1, 2*1+1) = 213
    assert(df(0).getString(0) == "213")
    assert(df(1).getString(0) == "0")
    assert(df(2).getString(0) == "3")
    // parent prefix: the z-1 quadkey of (x/2, y/2) prefixes the child's
    val child = Seq((6L, 10L, 4)).toDF("x", "y", "z")
      .select(Tiles.quadkey($"x", $"y", $"z").as("qk")).head.getString(0)
    val parent = Seq((3L, 5L, 3)).toDF("x", "y", "z")
      .select(Tiles.quadkey($"x", $"y", $"z").as("qk")).head.getString(0)
    assert(child.startsWith(parent), s"$child !startsWith $parent")
  }

  test("pyramid: every feature appears once per zoom; cap bounds kept rows per tile") {
    val pts = points(
      (1L, 10.0, 10.0, 5.0), (2L, 10.0001, 10.0001, 4.0), (3L, 10.0002, 10.0002, 3.0),
      (4L, 10.0003, 10.0003, 2.0), (5L, -50.0, -20.0, 1.0))
    val pyr = Tiles.pyramid(pts, "id", "lon", "lat", "weight", minZ = 2, maxZ = 6, cap = 2)
    assert(pyr.count() == 5 * 5)
    // at every zoom, a tile keeps at most cap features
    val over = pyr.filter($"kept")
      .groupBy("zoom", "tile_x", "tile_y").count().filter($"count" > 2)
    assert(over.isEmpty)
    // the four co-located points share a tile at z6 → exactly 2 kept, by weight
    val kept = pyr.filter($"zoom" === 6 && $"id" <= 4 && $"kept")
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L))
    // the isolated point is always kept
    assert(pyr.filter($"id" === 5 && !$"kept").isEmpty)
  }

  test("tileStats conserves features and weight per zoom") {
    val pts = points((1L, 1.0, 1.0, 2.0), (2L, 2.0, 2.0, 3.0), (3L, -3.0, -3.0, 4.0))
    val stats = Tiles.tileStats(
      Tiles.pyramid(pts, "id", "lon", "lat", "weight", minZ = 0, maxZ = 3, cap = 10),
      "weight")
    val perZoom = stats.groupBy("zoom")
      .agg(sum("n_features").as("n"), sum("weight").as("w"))
      .collect()
    assert(perZoom.length == 4)
    perZoom.foreach { r =>
      assert(r.getAs[Long]("n") == 3L)
      assert(r.getAs[Double]("w") == 9.0)
    }
  }
}
