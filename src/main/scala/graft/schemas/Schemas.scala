package graft.schemas

import org.apache.spark.sql.types._

/** Authoritative output schemas + layout registry — the Spark form of the
  * reference's version-keyed `DATASET_DICT`
  * (/root/reference/data/src/utils/constants.py:14-85): fixed column
  * sets and ordering, partition levels, and order-by columns per table,
  * keyed by SemVer version.
  */
object Schemas {

  /** times — README.md:240-244 (public files append chunk_id). */
  val times: StructType = StructType(Seq(
    StructField("origin_id", StringType, nullable = false),
    StructField("destination_id", StringType, nullable = false),
    StructField("duration_sec", DoubleType, nullable = true)))

  /** points — README.md:248-256, constants.py:29-44. */
  val points: StructType = StructType(Seq(
    StructField("point_type", StringType, nullable = false),
    StructField("id", StringType, nullable = false),
    StructField("lon", DoubleType, nullable = false),
    StructField("lat", DoubleType, nullable = false),
    StructField("lon_snapped", DoubleType, nullable = false),
    StructField("lat_snapped", DoubleType, nullable = false),
    StructField("is_snapped", BooleanType, nullable = false)))

  /** missing_pairs — README.md:285-290. */
  val missingPairs: StructType = StructType(Seq(
    StructField("origin_id", StringType, nullable = false),
    StructField("destination_id", StringType, nullable = false)))

  /** metadata (engine subset) — README.md:258-283 / FIXTURES.md §B8. */
  val metadata: StructType = StructType(Seq(
    StructField("run_id", StringType, nullable = false),
    StructField("calc_datetime_finished", TimestampType, nullable = false),
    StructField("calc_time_elapsed_sec", DoubleType, nullable = false),
    StructField("calc_n_origins", LongType, nullable = false),
    StructField("calc_n_destinations", LongType, nullable = false),
    StructField("calc_n_pairs", LongType, nullable = false),
    StructField("calc_n_missing_pairs", LongType, nullable = false),
    StructField("param_max_split_size", LongType, nullable = false),
    StructField("param_use_snapped", BooleanType, nullable = false)))

  /** blockloc — create_blockloc.py:11-21 (population int32 per
    * fetch_blockpop.py:47).
    */
  val blockloc: StructType = StructType(Seq(
    StructField("county", StringType, nullable = false),
    StructField("tract", StringType, nullable = false),
    StructField("block_group", StringType, nullable = false),
    StructField("block", StringType, nullable = false),
    StructField("population", IntegerType, nullable = false),
    StructField("x_4326", DoubleType, nullable = false),
    StructField("y_4326", DoubleType, nullable = false),
    StructField("x_5071", DoubleType, nullable = false),
    StructField("y_5071", DoubleType, nullable = false)))

  /** cenloc / destpoint — create_cenloc.py:17-27, create_destpoint.py:78-80. */
  val cenloc: StructType = StructType(Seq(
    StructField("geoid", StringType, nullable = false),
    StructField("x_4326", DoubleType, nullable = false),
    StructField("y_4326", DoubleType, nullable = false),
    StructField("x_4326_wt", DoubleType, nullable = false),
    StructField("y_4326_wt", DoubleType, nullable = false),
    StructField("x_5071", DoubleType, nullable = false),
    StructField("y_5071", DoubleType, nullable = false),
    StructField("x_5071_wt", DoubleType, nullable = false),
    StructField("y_5071_wt", DoubleType, nullable = false)))

  final case class TableSpec(
      schema: StructType,
      partitionLevels: Seq[String],
      orderBy: Seq[String])

  private val sixLevels = Seq("version", "mode", "year", "geography", "state", "centroid_type")

  /** version → table → spec (constants.py DATASET_DICT shape). */
  val registry: Map[String, Map[String, TableSpec]] = Map(
    "0.0.1" -> Map(
      "times" -> TableSpec(times, sixLevels, Seq("origin_id", "destination_id")),
      "points" -> TableSpec(points, sixLevels :+ "point_type", Seq("id")),
      "missing_pairs" -> TableSpec(missingPairs, sixLevels, Seq("origin_id", "destination_id")),
      "metadata" -> TableSpec(metadata, sixLevels.filterNot(_ == "state"), Seq("run_id"))))

  /** Validated job parameters — the TravelTimeArgs checks
    * (utils/times.py:46-72) as construction-time requires.
    */
  final case class Params(
      version: String, mode: String, year: String,
      geography: String, centroidType: String) {
    require(version.matches("""\d+\.\d+\.\d+"""), s"bad semver: $version")
    require(Set("car", "bicycle", "foot")(mode), s"bad mode: $mode")
    require(year.matches("""\d{4}"""), s"bad year: $year")
    require(
      Set("state", "county", "county_subdivision", "tract", "block_group", "zcta")(geography),
      s"bad geography: $geography")
    require(Set("weighted", "unweighted")(centroidType), s"bad centroid_type: $centroidType")
  }
}
