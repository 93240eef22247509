package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark plan builder plus (when SQL-expressible)
  * the equivalent ANSI SQL the driver runs in DuckDB over the same Parquet
  * files. Column names/types must match exactly between the two — the
  * driver sorts columns by name and hashes values.
  *
  * `headline = true` marks queries included in the Bench run.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

trait QueryPack {
  def queries: Seq[QueryDef]
}
