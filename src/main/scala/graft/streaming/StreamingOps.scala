package graft.streaming

import graft.{Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming surface. The reference has no streams (SURVEY
  * §2.10) — this is the extension track: the events table replayed as a
  * file stream through a windowed aggregation.
  *
  * Locally the parquet fixture drives the stream synchronously
  * (processAllAvailable + memory sink); in production the same plan runs
  * over a real source with `outputMode(append)` + watermark, and the
  * aggregation state lives in the state store.
  */
object StreamingOps {

  /** Tumbling-hour counts per event_type, computed by a streaming query.
    * `ts` arrives as nanos-since-epoch (see Tables.load); the bucket is
    * exact integer arithmetic.
    */
  def hourlyCounts(spark: SparkSession, sfDir: String, queryName: String = "graft_stream_hourly"): DataFrame = {
    import spark.implicits._
    val schema = T.events(spark, sfDir).schema // also sets nanosAsLong
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    val agg = stream
      .groupBy((expr("ts div 3600000000000") * 3600).as("hour_epoch"), $"event_type")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }

  /** Watermarked append-mode variant (the production shape): 1-hour
    * tumbling windows with a 2-hour watermark. Only windows the watermark
    * has passed are emitted, so the tail window stays in state — callers
    * compare against the oracle excluding the final window (unit-tested;
    * not part of the batch-oracle surface).
    */
  def hourlyCountsWatermarked(spark: SparkSession, sfDir: String, queryName: String = "graft_stream_wm"): DataFrame = {
    import spark.implicits._
    val schema = T.events(spark, sfDir).schema
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    val agg = stream
      .withColumn("tsc", timestamp_micros(expr("ts div 1000")))
      .withWatermark("tsc", "2 hours")
      .groupBy(window($"tsc", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp($"window.start").as("hour_epoch"), $"event_type", $"n")
    val q = agg.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }
}
