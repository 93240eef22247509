package graft

import graft.plans.MvCatalog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MvRewriteSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val basePath = s"$sf001/documents.parquet"
  private val mvPath = s"${GraftSession.scratchBase}/graft_mv_spec"

  private def baseAgg = spark.read.parquet(basePath)
    .groupBy($"source")
    .agg(count(lit(1)).as("n"), sum($"n_chars").as("total"))

  /** Root paths of every parquet scan in the optimized plan. */
  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        MvCatalog.rootPaths(l)
    }.flatten

  private def registered[A](f: => A): A = {
    MvCatalog.register(spark, "spec_mv", basePath,
      Seq("source"), Seq("n_chars"), mvPath)
    try f finally MvCatalog.drop("spec_mv")
  }

  test("a base-table aggregate is rewritten to scan the view, values unchanged") {
    val direct = baseAgg.as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    registered {
      val df = baseAgg
      val scans = scanPaths(df)
      assert(scans.exists(_.contains("graft_mv_spec")),
        s"aggregate not rewritten to the view: $scans")
      assert(!scans.exists(_.contains("documents.parquet")),
        s"rewritten plan still scans the base: $scans")
      assert(df.as[(String, Long, Long)].collect().sortBy(_._1).toSeq == direct)
    }
  }

  test("rewritten output keeps attribute ids: downstream ops still resolve") {
    registered {
      val df = baseAgg.filter($"n" > 0).orderBy($"source")
        .select($"source", ($"total" / $"n").as("avg_chars"))
      assert(scanPaths(df).exists(_.contains("graft_mv_spec")))
      assert(df.count() > 0)
    }
  }

  test("near-misses fall through: filter, extra group, distinct, avg, other table") {
    registered {
      val plans = Seq(
        spark.read.parquet(basePath).filter($"lang" === "en")
          .groupBy($"source").agg(count(lit(1)).as("n")),
        spark.read.parquet(basePath)
          .groupBy($"source", $"lang").agg(count(lit(1)).as("n")),
        spark.read.parquet(basePath)
          .groupBy($"source").agg(countDistinct($"lang").as("n")),
        spark.read.parquet(basePath)
          .groupBy($"source").agg(avg($"n_chars").as("a")),
        spark.read.parquet(s"$sf001/orders.parquet")
          .groupBy($"o_orderstatus").agg(count(lit(1)).as("n")))
      plans.foreach { df =>
        val scans = scanPaths(df)
        assert(!scans.exists(_.contains("graft_mv_spec")),
          s"over-eager rewrite: $scans")
      }
    }
  }

  test("a CACHED base still rewrites; a cached filtered subset never does") {
    val cached = spark.read.parquet(basePath).cache()
    try {
      cached.count() // materialize the cache
      registered {
        val agg = cached.groupBy($"source")
          .agg(count(lit(1)).as("n"), sum($"n_chars").as("total"))
        assert(scanPaths(agg).exists(_.contains("graft_mv_spec")),
          "cached base disabled aggregate navigation")
        // a cached FILTERED frame must not be mistaken for the base
        val subset = spark.read.parquet(basePath).filter($"lang" === "en").cache()
        try {
          subset.count()
          val sAgg = subset.groupBy($"source").agg(count(lit(1)).as("n"))
          assert(!scanPaths(sAgg).exists(_.contains("graft_mv_spec")),
            "cached filtered subset wrongly rewrote to the full-table view")
        } finally subset.unpersist()
      }
    } finally cached.unpersist()
  }

  test("invalidate stops the rewrite until re-registration") {
    registered {
      MvCatalog.invalidate("spec_mv")
      assert(!scanPaths(baseAgg).exists(_.contains("graft_mv_spec")),
        "stale view still used")
    }
  }
}
