package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark plan builder plus (when SQL-expressible)
  * the equivalent ANSI SQL the driver runs in DuckDB over the same Parquet
  * files. Column names/types must match exactly between the two — the
  * driver sorts columns by name and hashes values.
  *
  * `headline = true` marks queries included in the Bench run.
  *
  * `oracleLazy` is the late-bound variant for oracles that can only be
  * KNOWN after the builder ran (e.g. q234 hands DuckDB the engine-free
  * view artifact the builder just emitted — the SQL embeds batch-dir
  * names that exist only post-build). Verify dumps oracle SQL after
  * running every builder, so the thunk resolves then; it must return a
  * harmless placeholder when its artifact is absent (scoped runs).
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false,
    oracleLazy: Option[() => String] = None)

trait QueryPack {
  def queries: Seq[QueryDef]
}
