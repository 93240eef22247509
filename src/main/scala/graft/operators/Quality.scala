package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the constraint gate a multi-stage
  * pipeline runs between stages (the reference enforces row-count and
  * no-null invariants between its DVC stages; [[graft.jobs.Pipeline]]
  * wires these as stage contracts). Three shapes:
  *
  *  - [[audit]]: N row-level predicate checks in ONE aggregate pass over
  *    the table (a single scan regardless of check count — map-side
  *    partial sums, one tiny row out), unpivoted to (check, violations,
  *    total) rows.
  *  - [[duplicateKeys]]: excess-row count per duplicated key — one
  *    groupBy on the key columns.
  *  - [[orphans]]: referential-integrity violations as a broadcast/hash
  *    anti-join count (child keys with no parent).
  *
  * All outputs are integer counts — engine-portable, hash-verifiable.
  */
object Quality {

  /** One row per check: (check, violations, total). `checks` map a name
    * to a VIOLATION predicate (true = row fails the expectation).
    */
  def audit(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val aggs = checks.map { case (n, pred) =>
      sum(when(pred, 1L).otherwise(0L)).as(s"__v_$n")
    } :+ count(lit(1)).as("__total")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = checks.map { case (n, _) =>
      struct(lit(n).as("check_name"), col(s"__v_$n").as("violations"),
        col("__total").as("total"))
    }
    one.select(explode(array(stacked: _*)).as("r"))
      .select(col("r.check_name"), col("r.violations"), col("r.total"))
  }

  /** (check, violations, total) where violations = rows that are excess
    * copies under `keyCols` (Σ max(cnt−1, 0)) — 0 iff the key is unique.
    */
  def duplicateKeys(df: DataFrame, checkName: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("cnt"))
      .agg(sum(col("cnt") - 1L).as("violations"), sum(col("cnt")).as("total"))
      .select(lit(checkName).as("check_name"),
        coalesce(col("violations"), lit(0L)).as("violations"),
        coalesce(col("total"), lit(0L)).as("total"))

  /** (check, violations, total) where violations = child rows whose
    * `childKey` has no match in `parent.parentKey`.
    */
  def orphans(child: DataFrame, parent: DataFrame, checkName: String,
      childKey: String, parentKey: String): DataFrame = {
    val totalDf = child.agg(count(lit(1)).as("total"))
    val orphanDf = child
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("violations"))
    orphanDf.crossJoin(totalDf)
      .select(lit(checkName).as("check_name"), col("violations"), col("total"))
  }

  /** Per-column profile: rows, nulls, exact distinct count, min/max
    * rendered as strings — the discovery half of the audit (what's IN
    * this table) next to [[audit]]'s contract half (does it hold).
    * One scan: every column's aggregates ride a single `agg` (Spark
    * plans the multi-column distinct via one Expand — k·rows
    * intermediate, still one pass over the files); the wide 1-row
    * result melts to long format driver-side (k rows, never data).
    *
    * `exact = false` swaps exact NDV for HLL `approx_count_distinct`
    * (±~2%) — at 100 TB the Expand's k-fold intermediate is the cost
    * knob and the approximate path is one ordinary combiner agg.
    * min/max stringification is for the report; oracle comparisons
    * should stick to integer/string columns (float rendering differs
    * across engines).
    */
  def profile(df: DataFrame, columns: Seq[String] = Nil,
      exact: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, 1)).as(s"__nulls_$c"),
        (if (exact) count_distinct(col(c))
         else approx_count_distinct(col(c))).as(s"__ndv_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val nRows = row.getAs[Long]("__rows")
    val types = df.schema.map(f => f.name -> f.dataType.simpleString).toMap
    cols.map { c =>
      (c, types(c), nRows,
        row.getAs[Long](s"__nulls_$c"),
        row.getAs[Long](s"__ndv_$c"),
        Option(row.getAs[String](s"__min_$c")),
        Option(row.getAs[String](s"__max_$c")))
    }.toDF("column", "dtype", "n_rows", "n_nulls", "n_distinct",
      "min_value", "max_value")
  }
}
