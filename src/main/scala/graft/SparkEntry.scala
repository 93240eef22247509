package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from per-family packs; each entry carries its own
  * DuckDB oracle SQL where the semantics are ANSI-SQL-expressible.
  */
object SparkEntry {
  private def packs: Seq[QueryPack] = Seq(
    RelationalQueries,
    TpchQueries,
    DomainQueries,
    NetworkQueries,
    PipelineQueries)

  lazy val all: Seq[QueryDef] = packs.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all.head.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.orElse(q.oracleLazy.map(_()))
      .map(o => q.name -> o)).toMap

  /** Subset timed by Bench. */
  def headline: Seq[QueryDef] = all.filter(_.headline)
}
