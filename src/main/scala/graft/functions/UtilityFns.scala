package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Driver-side formatting/param helpers from the reference, lifted to
  * engine scalar functions so they run distributed over result columns
  * (F8/F9 — `utils/utils.py:31-43`, `create_blockloc.py:35`).
  *
  * All three are pure `Column` compositions (whole-stage codegen, no
  * UDFs). Two-decimal formatting goes through INTEGER-CENTS arithmetic
  * (`floor(v*100 + 0.5)` then divmod), never `%.2f`: Java's Formatter
  * rounds the double's SHORTEST decimal repr ("390.515" → .52 HALF_UP)
  * while C/DuckDB printf correctly rounds the exact binary value
  * (390.51499…8 → .51) — the cents path does the identical IEEE ops in
  * both engines, so the oracle hash-matches.
  */
object UtilityFns {

  /** F8 `format_size`: "1.50 KB"-style human size. Mirrors the reference
    * loop exactly — successive /1024 (exact: power-of-two division) until
    * < 1024, two decimals; ≥ 1024 TB falls off the unit list and yields
    * null, as the Python loop returns None there.
    */
  def humanSize(bytes: Column): Column = {
    val b = bytes.cast("double")
    val steps = Seq("B" -> 1d, "KB" -> 1024d, "MB" -> 1048576d,
      "GB" -> 1073741824d, "TB" -> 1099511627776d)
    steps.foldLeft(lit(null).cast("string")) { case (acc, (unit, div)) =>
      when(acc.isNotNull, acc)
        .when(b / div < 1024d, fmt2(b / div, unit))
    }
  }

  /** Two decimals via integer cents (see object doc for why not %.2f). */
  private def fmt2(v: Column, unit: String): Column = {
    val cents = floor(v * 100 + lit(0.5)).cast("long")
    concat(
      (cents / 100).cast("long").cast("string"), lit("."),
      lpad((cents % 100).cast("string"), 2, "0"), lit(s" $unit"))
  }

  /** F8 `format_time`: "1H 2M 3s" — integer divmod chain, truncation
    * semantics identical to Python's int().
    */
  def humanTime(seconds: Column): Column = {
    val s = seconds.cast("long")
    // `/` on longs is double division in Spark SQL — truncate back to
    // long (all values < 2^53, so the double round-trip is exact)
    concat(
      (s / 3600).cast("long").cast("string"), lit("H "),
      (s % 3600 / 60).cast("long").cast("string"), lit("M "),
      (s % 60).cast("string"), lit("s"))
  }

  /** F9 decade floor (`create_blockloc.py:35`): census population vintage
    * for a given ACS year — `floor(year / 10) * 10`.
    */
  def decadeFloor(year: Column): Column =
    (year.cast("int") / 10).cast("int") * 10
}
