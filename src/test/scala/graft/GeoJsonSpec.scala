package graft

import graft.etl.OsmClip
import graft.geo.Geometry
import graft.sources.{GeoJson, Shapefile}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S9 GeoJSON sink + the composed osmclip stage
  * (create_osmclip.py:12-59): geometry serialization, both write paths,
  * and the shapefile → buffer → clip → GeoJSON pipeline end-to-end.
  */
class GeoJsonSpec extends AnyFunSuite {
  import SparkTestSession._

  test("geometryJson: POLYGON keeps hole rings; MULTIPOLYGON keeps part grouping") {
    val poly = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
    val pj = GeoJson.geometryJson(poly)
    assert(pj.contains("\"type\":\"Polygon\""))
    assert(pj.contains("[[[0,0],[10,0],[10,10],[0,10],[0,0]],[[4,4],[6,4],[6,6],[4,6],[4,4]]]"))

    val multi = "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5), (5.5 5.5, 6 5.5, 6 6, 5.5 6, 5.5 5.5)))"
    val mj = GeoJson.geometryJson(multi)
    assert(mj.contains("\"type\":\"MultiPolygon\""))
    // part 1: one ring; part 2: outer + hole
    assert(mj.contains("[[[[0,0],[2,0],[2,2],[0,2],[0,0]]],"))
    assert(mj.contains("[[[5,5],[7,5],[7,7],[5,7],[5,5]],[[5.5,5.5],[6,5.5],[6,6],[5.5,6],[5.5,5.5]]]]"))
  }

  test("writeFeatureLines: distributed newline-delimited features round-trip through the json reader") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", 1L, Geometry.rectWkt(0, 0, 2, 2)),
      ("b", 2L, Geometry.rectWkt(5, 5, 7, 7)),
      ("c", 3L, Geometry.rectWkt(1, 1, 3, 3))).toDF("id", "n", "wkt")
    val dir = "/tmp/graft_geojson_lines"
    GeoJson.writeFeatureLines(df, "wkt", dir)
    val back = s.read.json(dir)
    assert(back.count() == 3)
    val row = back.filter(col("properties.id") === "b").select(
      col("type"), col("geometry.type").as("gt"),
      col("properties.n"), col("geometry.coordinates")).collect().head
    assert(row.getString(0) == "Feature" && row.getString(1) == "Polygon")
    assert(row.getLong(2) == 2L)
  }

  test("writeFeatureCollection: single-document artifact, bounded collect") {
    val s = spark
    import s.implicits._
    val df = Seq(("17", Geometry.rectWkt(-90, 40, -88, 42))).toDF("id", "wkt")
    val path = "/tmp/graft_geojson_fc/boundary.geojson"
    GeoJson.writeFeatureCollection(df, "wkt", path)
    val doc = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    val parsed = s.read.json(s.createDataset(Seq(doc)))
    assert(parsed.select("type").collect().head.getString(0) == "FeatureCollection")
    assert(parsed.select(size(col("features"))).collect().head.getInt(0) == 1)
    assert(parsed.select(col("features")(0).getField("properties").getField("id"))
      .collect().head.getString(0) == "17")

    // the cap refuses unbounded driver collects instead of OOMing
    val big = (0 until 5).map(i => (s"g$i", Geometry.rectWkt(i, i, i + 1, i + 1)))
      .toDF("id", "wkt")
    intercept[IllegalArgumentException] {
      GeoJson.writeFeatureCollection(big, "wkt", "/tmp/graft_geojson_fc/too_big.geojson",
        maxFeatures = 3)
    }
  }

  test("OsmClip end-to-end: shapefile zip -> buffer -> guard-box clip -> GeoJSON artifact") {
    val s = spark
    // two "states": 17 spans lon [-20,-10] so the -16° guard edge clips
    // it; 18 must not leak into the artifact
    val zip = "/tmp/graft_osmclip_fixture.zip"
    Shapefile.writeZip(zip, "state",
      Seq(Shapefile.Field("GEOID20", 'C', 2, 0), Shapefile.Field("NAME20", 'C', 8, 0)),
      Seq(
        (Seq("17", "east"), Geometry.parseWkt(Geometry.rectWkt(-20, 30, -10, 40))),
        (Seq("18", "west"), Geometry.parseWkt(Geometry.rectWkt(-100, 30, -95, 35)))))

    val out = "/tmp/graft_osmclip_out/17.geojson"
    OsmClip.run(s, zip, geoid = "17", bufferMeters = 1000.0, outGeoJson = out)

    val doc = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out)), "UTF-8")
    val parsed = s.read.json(s.createDataset(Seq(doc))(org.apache.spark.sql.Encoders.STRING))
    assert(parsed.select(size(col("features"))).collect().head.getInt(0) == 1)
    val coords = parsed
      .select(explode(col("features")(0).getField("geometry").getField("coordinates")).as("ring"))
      .select(explode(col("ring")).as("pt"))
      .select(col("pt")(0).as("lon"), col("pt")(1).as("lat"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(coords.nonEmpty)
    val lons = coords.map(_._1); val lats = coords.map(_._2)
    // guard box cut the east edge at exactly -16° (Albers meridians are
    // straight rays, so the projected chord IS the meridian)
    assert(lons.max < -15.99 && lons.max > -16.01, s"max lon ${lons.max}")
    // west edge rides a meridian (straight ray) → only the ~0.01° buffer
    assert(lons.min < -20.0 && lons.min > -20.1, s"min lon ${lons.min}")
    assert(lats.min < 30.0 && lats.min > 29.9, s"min lat ${lats.min}")
    // the top edge is a straight CHORD in projected space; the chord of a
    // 10°-of-longitude parallel arc sags ~0.1° toward the cone apex when
    // mapped back (vertex-wise reprojection — shapely behaves identically)
    assert(lats.max > 40.0 && lats.max < 40.2, s"max lat ${lats.max}")
  }
}
