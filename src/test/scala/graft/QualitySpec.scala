package graft

import graft.operators.Quality
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualitySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("audit: planted violations are counted exactly, one row per check") {
    val df = Seq(
      (1L, 10, "en"), (2L, -5, "en"), (3L, 200, "xx"), (4L, 30, null))
      .toDF("id", "qty", "lang")
    val got = Quality.audit(df, Seq(
      "qty_range" -> !$"qty".between(0, 100),
      "lang_domain" -> !$"lang".isin("en", "de")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // null lang: isin -> null -> violation predicate null -> NOT counted
    // (unknown, not failed) — same CASE WHEN semantics as the oracle
    assert(got == Map("qty_range" -> (2L, 4L), "lang_domain" -> (1L, 4L)))
  }

  test("audit: N checks cost ONE scan of the table") {
    val df = Seq((1L, 10), (2L, 20)).toDF("id", "v")
    val plan = Quality.audit(df, Seq(
      "a" -> ($"v" < 0), "b" -> ($"v" > 100), "c" -> $"id".isNull))
      .queryExecution.executedPlan.toString
    val scans = "(?i)tablescan|scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected a single scan for all checks:\n$plan")
  }

  test("duplicateKeys: excess copies counted; zero on unique keys; empty input") {
    val dup = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d")).toDF("k", "x")
    val g1 = Quality.duplicateKeys(dup, "pk", Seq("k")).collect().head
    assert((g1.getString(0), g1.getLong(1), g1.getLong(2)) == ("pk", 2L, 4L))
    val uniq = Seq((1L, "a"), (2L, "b")).toDF("k", "x")
    assert(Quality.duplicateKeys(uniq, "pk", Seq("k")).collect().head.getLong(1) == 0L)
    val empty = spark.emptyDataFrame.withColumn("k", lit(1L)).filter(lit(false))
    assert(Quality.duplicateKeys(empty, "pk", Seq("k")).collect().head.getLong(1) == 0L)
  }

  test("profile: one row per column with exact counts and rendered bounds") {
    val df = Seq(
      (Option(1L), Option("aa")),
      (Option(2L), Option("bb")),
      (Option(2L), Option("cc")),
      (Option(3L), None),
      (Option.empty[Long], Option("x1"))
    ).toDF("id", "tag")
    val p = Quality.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("id", "tag"))
    val id = p("id")
    assert(id.getString(1) == "bigint")
    assert(id.getLong(2) == 5L)          // n_rows
    assert(id.getLong(3) == 1L)          // n_nulls
    assert(id.getLong(4) == 3L)          // n_distinct (1,2,3)
    assert(id.getString(5) == "1" && id.getString(6) == "3")
    assert(p("tag").getLong(3) == 1L && p("tag").getLong(4) == 4L)
    assert(p("tag").getString(5) == "aa" && p("tag").getString(6) == "x1")
    // approx path: same shape, NDV within HLL tolerance of exact
    val approx = Quality.profile(df, exact = false).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(math.abs(approx("id") - 3L) <= 1)
    // column subset is respected
    assert(Quality.profile(df, Seq("tag")).collect().map(_.getString(0)).toSeq
      == Seq("tag"))
  }

  test("orphans: child keys missing from the parent are counted") {
    val child = Seq((1L, "x"), (2L, "y"), (9L, "z"), (9L, "w")).toDF("fk", "p")
    val parent = Seq((1L, "p1"), (2L, "p2"), (3L, "p3")).toDF("pk", "q")
    val r = Quality.orphans(child, parent, "fk_check", "fk", "pk").collect().head
    assert((r.getString(0), r.getLong(1), r.getLong(2)) == ("fk_check", 2L, 4L))
  }
}
