package graft.geo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slippy-map tile pyramid generation — the in-engine analog of the
  * reference's tippecanoe stage (`data/src/create_tiles.sh:20-24`:
  * `tippecanoe -zg --coalesce-densest-as-needed` over the cenloc
  * GeoJSON). tippecanoe is a single-node C++ binary; at 100 TB the tile
  * build must itself be a distributed job, so this reformulates the two
  * things the reference actually uses it for — a zoom pyramid addressed
  * by z/x/y and per-tile feature thinning in dense areas — as one
  * declarative plan:
  *
  *   - Web Mercator tile addressing (standard slippy-map math,
  *     https://wiki.openstreetmap.org/wiki/Slippy_map_tilenames) as pure
  *     column arithmetic, plus the base-4 quadkey string used by tiled
  *     stores.
  *   - The zoom pyramid as a bounded explode (maxZ−minZ+1 rows per
  *     feature), NOT a per-zoom re-scan of the input.
  *   - Densest-coalesce as a rank-within-tile retention: every tile
  *     keeps its `cap` heaviest features (weight desc, id asc for
  *     determinism) and drops the rest, which is tippecanoe's
  *     `--coalesce-densest-as-needed` policy expressed as a window.
  *
  * Scale shape: one explode (fan-out ≤ #zooms), one shuffle on the tile
  * key for the rank window. No driver-side state, no per-zoom loop. Tile
  * keys are high-cardinality at deep zooms so the shuffle spreads; at
  * shallow zooms tiles are few but so are retained rows per tile after
  * the cap. A real deployment writes the result partitioned by zoom so
  * a tile server prunes to one directory per request.
  */
object Tiles {

  /** Web Mercator tile X at zoom z: floor((lon+180)/360 · 2^z). */
  def tileX(lon: Column, z: Column): Column =
    floor((lon + lit(180.0)) / lit(360.0) * pow(lit(2.0), z)).cast("long")

  /** Web Mercator tile Y at zoom z:
    * floor((1 − ln(tan φ + sec φ)/π)/2 · 2^z).
    */
  def tileY(lat: Column, z: Column): Column = {
    val phi = radians(lat)
    floor((lit(1.0) - log(tan(phi) + lit(1.0) / cos(phi)) / lit(math.Pi)) /
      lit(2.0) * pow(lit(2.0), z)).cast("long")
  }

  /** Base-4 quadkey (Bing tile addressing): digit i (MSB first) is
    * bit i of y times 2 plus bit i of x.
    */
  def quadkey(x: Column, y: Column, z: Column): Column = {
    // bit i via floor-division — 2^i and tile indices are exact in
    // doubles for z ≤ 30, and the same arithmetic replays in SQL
    def bit(v: Column, i: Column): Column =
      floor(v / pow(lit(2.0), i)).cast("long") % 2
    // z = 0 is the single world tile: empty quadkey (Spark's sequence
    // rejects the empty descending range DuckDB returns silently)
    when(z <= 0, lit("")).otherwise(
      concat_ws("", transform(sequence(z - lit(1), lit(0), lit(-1)),
        i => (bit(x, i) + bit(y, i) * 2).cast("string"))))
  }

  /** Per-feature tile assignment across zooms [minZ, maxZ] with
    * densest-coalesce retention: each (zoom, x, y) tile keeps its `cap`
    * heaviest features. Output one row per (feature, zoom):
    * zoom, tile_x, tile_y, quadkey, id, weight rank within tile,
    * kept flag, and the tile's pre-thinning feature count.
    */
  def pyramid(
      points: DataFrame,
      idCol: String,
      lonCol: String,
      latCol: String,
      weightCol: String,
      minZ: Int,
      maxZ: Int,
      cap: Int): DataFrame = {
    require(minZ >= 0 && maxZ >= minZ && maxZ <= 30, s"bad zoom range [$minZ,$maxZ]")
    val z = col("zoom")
    val tile = Window.partitionBy(z, col("tile_x"), col("tile_y"))
    val byWeight = tile.orderBy(col(weightCol).desc, col(idCol))
    points
      .select(col(idCol), col(lonCol), col(latCol), col(weightCol))
      .withColumn("zoom", explode(sequence(lit(minZ), lit(maxZ))))
      .withColumn("tile_x", tileX(col(lonCol), z))
      .withColumn("tile_y", tileY(col(latCol), z))
      .withColumn("quadkey", quadkey(col("tile_x"), col("tile_y"), z))
      .withColumn("rnk", row_number().over(byWeight).cast("long"))
      .withColumn("n_in_tile", count(lit(1)).over(tile))
      .withColumn("kept", col("rnk") <= cap)
      .select(col("zoom").cast("long").as("zoom"),
        col("tile_x"), col("tile_y"), col("quadkey"),
        col(idCol), col(weightCol), col("rnk"), col("kept"), col("n_in_tile"))
  }

  /** Tile-level rollup of a [[pyramid]] frame: feature counts and kept
    * counts per tile — what a tileset manifest (tile index, zoom stats)
    * is built from.
    */
  def tileStats(pyramid: DataFrame, weightCol: String): DataFrame =
    pyramid
      .groupBy(col("zoom"), col("tile_x"), col("tile_y"), col("quadkey"))
      .agg(
        count(lit(1)).as("n_features"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(col(weightCol)).as("weight"))
}
