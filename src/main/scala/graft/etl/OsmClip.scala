package graft.etl

import graft.geo.{Albers, Geometry}
import graft.sources.{GeoJson, Shapefile}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The reference's `create_osmclip` stage end-to-end
  * (`/root/reference/data/src/create_osmclip.py:12-59`): zipped TIGER
  * state shapefile → filter to one geoid → project to the equal-area CRS
  * (EPSG:5071) → buffer by meters → clip to the dateline-guard bbox →
  * back to EPSG:4326 → one-feature GeoJSON artifact.
  *
  * Composes S4 (shapefile scan) + F11 (CRS transform) + F12 (buffer) +
  * F13 (bbox clip) + S9 (GeoJSON sink). The boundary is ONE polygon
  * (create_osmclip.py filters `geoid == state`), so the geometry math
  * runs driver-side on that single feature exactly like the reference's
  * single-row GeoDataFrame — the distributed pieces are the shapefile
  * scan in and whatever consumes the artifact downstream.
  *
  * The clip box is given in lon/lat (the reference's
  * `box(-177, -32, -16, 70)`); like `bbox_gdf.to_crs(5071)`, its corners
  * are projected and the resulting convex quadrilateral is the clip
  * window in projected space.
  */
object OsmClip {

  def run(
      spark: SparkSession,
      shapefileZip: String,
      geoid: String,
      bufferMeters: Double,
      outGeoJson: String,
      bboxLonLat: (Double, Double, Double, Double) = (-177.0, -32.0, -16.0, 70.0)): Unit = {

    val gdf = Shapefile.loadZip(spark, shapefileZip)
    val hits = gdf.filter(col("geoid") === geoid).select("wkt").collect()
    require(hits.length == 1, s"expected exactly one boundary for geoid=$geoid, got ${hits.length}")
    val boundary4326 = Geometry.parseWkt(hits.head.getString(0))

    // EPSG:4326 → 5071 (vertex-wise, like gdf.to_crs)
    val proj = Geometry.Polygon(boundary4326.rings.map(_.map {
      case (lon, lat) => Albers.forward(lon, lat)
    }))

    val buffered = if (bufferMeters != 0) proj.buffer(bufferMeters) else proj

    // the lon/lat guard box, corners projected — a convex quad in 5071
    val (bx1, by1, bx2, by2) = bboxLonLat
    val clipQuad = Array((bx1, by1), (bx2, by1), (bx2, by2), (bx1, by2))
      .map { case (lon, lat) => Albers.forward(lon, lat) }
    val clipped = buffered.clipConvex(clipQuad)
    require(clipped.rings.nonEmpty, s"boundary for geoid=$geoid clipped away entirely")

    // back to 4326 and out as the reference's one-feature artifact
    val back = Geometry.Polygon(clipped.rings.map(_.map {
      case (x, y) => Albers.inverse(x, y)
    }))
    import spark.implicits._
    val out = Seq((geoid, Geometry.toWkt(back))).toDF("id", "wkt")
    GeoJson.writeFeatureCollection(out, "wkt", outGeoJson)
  }
}
