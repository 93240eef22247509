package graft.sources

import graft.geo.Geometry
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** S9 GeoJSON sink — the reference writes each clipped state boundary as
  * a one-feature GeoJSON file (`create_osmclip.py:38,58`:
  * `gdf.to_file(driver="GeoJSON")`).
  *
  * Two write paths, matching the two scales the format is used at:
  *  - [[writeFeatureCollection]]: a single `FeatureCollection` document —
  *    the reference's artifact shape. A FeatureCollection is one JSON
  *    value, so this is inherently a driver-side single-file write; it
  *    BOUNDS the collect to `maxFeatures` (default 10k) and refuses
  *    larger inputs rather than silently OOMing the driver. Boundary
  *    artifacts are 1 row; this cap is three orders of magnitude of
  *    headroom.
  *  - [[writeFeatureLines]]: newline-delimited features (one JSON object
  *    per line, the "GeoJSONSeq" convention) written distributed via the
  *    text sink — the scale path: no collect, no single-file bottleneck,
  *    consumable by anything that streams features.
  *
  * Geometry comes from a WKT column (POLYGON / MULTIPOLYGON as parsed by
  * [[graft.geo.Geometry.parseWkt]]); remaining columns become feature
  * `properties` verbatim.
  */
object GeoJson {

  /** WKT polygon → GeoJSON geometry object. POLYGON keeps ring order
    * (ring 0 outer, rest holes — the convention our parser, even-odd
    * containment, and the reference's shapely output all share);
    * MULTIPOLYGON preserves part grouping as a GeoJSON MultiPolygon.
    */
  def geometryJson(wkt: String): String = {
    val t = wkt.trim
    if (t.regionMatches(true, 0, "MULTIPOLYGON", 0, 12)) {
      val body = t.drop(12).trim.stripPrefix("(").stripSuffix(")")
      // parts are separated at the ")), ((" boundary; re-wrap each so the
      // innermost-group ring regex applies per part
      val parts = body.split("\\)\\s*\\)\\s*,\\s*\\(\\s*\\(").map { part =>
        ringsJson("((" + part.replaceAll("^[\\s(]+", "").replaceAll("[\\s)]+$", "") + "))")
      }.mkString("[", ",", "]")
      s"""{"type":"MultiPolygon","coordinates":$parts}"""
    } else {
      // parse (validates) then serialize rings in order
      Geometry.parseWkt(t)
      s"""{"type":"Polygon","coordinates":${ringsJson(t)}}"""
    }
  }

  private def ringsJson(s: String): String =
    "\\(([^()]+)\\)".r.findAllMatchIn(s).map { m =>
      m.group(1).split(",").map { pair =>
        val xs = pair.trim.split("\\s+")
        s"[${num(xs(0).toDouble)},${num(xs(1).toDouble)}]"
      }.mkString("[", ",", "]")
    }.mkString("[", ",", "]")

  // JSON numbers: shortest round-trip double repr, integral values
  // without the trailing ".0" (matches what fiona/GDAL wrote for the
  // reference's artifacts)
  private def num(d: Double): String =
    if (d == d.toLong.toDouble) d.toLong.toString else d.toString

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def propJson(r: Row, cols: Seq[String]): String =
    cols.map { c =>
      val v = r.getAs[Any](c) match {
        case null => "null"
        case s: String => jsonStr(s)
        case b: Boolean => b.toString
        case d: Double => num(d)
        case f: Float => num(f.toDouble)
        case n: Number => n.toString
        case other => jsonStr(other.toString)
      }
      s"${jsonStr(c)}:$v"
    }.mkString("{", ",", "}")

  /** One feature per row as a JSON string column (shared by both sinks —
    * the serialization runs distributed either way).
    */
  private def featureLines(df: DataFrame, wktCol: String): DataFrame = {
    val props = df.columns.filterNot(_ == wktCol).toSeq
    val geomU = udf(geometryJson _)
    val propU = udf((r: Row) => propJson(r, props))
    df.select(
      concat(
        lit("""{"type":"Feature","geometry":"""),
        geomU(col(wktCol)),
        lit(""","properties":"""),
        propU(struct(props.map(col): _*)),
        lit("}")).as("feature"))
  }

  /** Newline-delimited GeoJSON features, written distributed. */
  def writeFeatureLines(df: DataFrame, wktCol: String, path: String): Unit =
    featureLines(df, wktCol).write.mode("overwrite").text(path)

  /** Single `FeatureCollection` file — the reference's boundary-artifact
    * shape (bounded driver-side write; see object doc).
    */
  def writeFeatureCollection(
      df: DataFrame, wktCol: String, path: String, maxFeatures: Int = 10000): Unit = {
    val lines = featureLines(df, wktCol).limit(maxFeatures + 1)
      .collect().map(_.getString(0))
    require(lines.length <= maxFeatures,
      s"FeatureCollection sink is for bounded artifacts (> $maxFeatures features); " +
        "use writeFeatureLines for large feature sets")
    val doc = lines.mkString(
      """{"type":"FeatureCollection","features":[""", ",", "]}")
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, doc)
  }

  /** Read back a (Multi)Polygon FeatureCollection artifact as
    * (id, polygon) — the consumer side of [[writeFeatureCollection]],
    * mirroring how the reference's destpoint stage loads the osmclip
    * boundary (`gpd.read_file` in create_destpoint.py). Spark's JSON
    * reader does the parsing against an explicit schema (coordinates as
    * the 3-deep Polygon nesting; MultiPolygon parts surface as extra
    * rings, which the engine's even-odd containment treats identically).
    * Driver-side result by design: boundary artifacts are one-per-state,
    * bounded like the writer.
    */
  def readFeatureCollection(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, graft.geo.Geometry.Polygon)] = {
    import org.apache.spark.sql.types._
    val polyCoords = ArrayType(ArrayType(ArrayType(DoubleType)))
    def read(coords: DataType) = spark.read.option("multiLine", "true")
      .schema(StructType(Seq(StructField("features", ArrayType(StructType(Seq(
        StructField("properties", StructType(Seq(StructField("id", StringType)))),
        StructField("geometry", StructType(Seq(
          StructField("type", StringType),
          StructField("coordinates", coords)))))))))))
      .json(path)
      .selectExpr("explode(features) AS f")
      .selectExpr("f.properties.id AS id", "f.geometry.type AS gtype",
        "f.geometry.coordinates AS coords")
      .collect()
    // two passes against the two nestings; a coordinates value that does
    // not match the requested depth parses as null, so gtype selects the
    // valid one per feature
    val raw = read(polyCoords)
    val rawMulti = read(ArrayType(polyCoords))
    import scala.collection.{Seq => CSeq}
    def rings(seq: CSeq[CSeq[CSeq[Double]]]): Array[Array[(Double, Double)]] =
      seq.map(_.map(pt => (pt.head, pt(1))).toArray).toArray
    raw.indices.map { i =>
      val r = raw(i)
      val id = r.getString(0)
      if (r.getString(1) == "MultiPolygon") {
        val parts = rawMulti(i).getSeq[CSeq[CSeq[CSeq[Double]]]](2)
        id -> graft.geo.Geometry.Polygon(parts.iterator.flatMap(rings).toArray)
      } else {
        id -> graft.geo.Geometry.Polygon(rings(r.getSeq[CSeq[CSeq[Double]]](2)))
      }
    }.toSeq
  }
}
