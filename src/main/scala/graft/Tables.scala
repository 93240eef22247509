package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

/** Loaders for the driver's fixture tables (TESTDATA.md). One Parquet file
  * per table; schemas come from the footers. Scans are plain
  * `spark.read.parquet` so Catalyst keeps projection/predicate pushdown
  * (SURVEY §2.1 S1).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The engine contract for `events.ts` is nanos-since-epoch as a LONG so
    * queries do exact integer arithmetic (`ts div 3600000000000` etc.).
    * Fixture generations have stored `ts` with different parquet units —
    * TIMESTAMP(NANOS) originally, TIMESTAMP(MICROS) today — so the loader
    * is schema-adaptive rather than unit-assuming. With `nanosAsLong` set
    * before the read, the surfaced Spark type fully determines the footer
    * unit: NANOS arrives as LongType (already the contract), MICROS/MILLIS
    * arrive as a timestamp type (no sub-microsecond precision exists to
    * lose), so `unix_micros(..) * 1000` is exact.
    *
    * Precondition for NTZ: the session timezone is UTC (GraftSession pins
    * it) — the NTZ wall-clock is a UTC instant, so `cast(ts as timestamp)`
    * is an identity on the epoch value.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType)         => df // TIMESTAMP(NANOS) via nanosAsLong: already epoch nanos
      case Some(TimestampNTZType) => df.withColumn("ts", expr("unix_micros(cast(ts as timestamp)) * 1000L"))
      case Some(TimestampType)    => df.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      case _                      => df
    }

  /** Footer schema of events.parquet as the file-stream source must declare
    * it (pre-normalization; [[normalizeEventTs]] is applied to the stream
    * DataFrame afterwards, exactly as [[load]] does for batch).
    */
  def eventsRawSchema(spark: SparkSession, sfDir: String): StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet").schema
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // Legacy fixtures store ts as parquet TIMESTAMP(NANOS): Spark has no
      // nanosecond timestamp type, so surface those as a raw nanos long.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventTs(spark.read.parquet(s"$sfDir/$name.parquet"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
