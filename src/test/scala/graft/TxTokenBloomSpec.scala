package graft

import graft.sources.TxLog
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Token/phrase blooms: manifest-level CONTAINS-TERM file skipping. */
class TxTokenBloomSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def fresh(name: String): String = {
    val dir = s"${GraftSession.scratchBase}/txtok_spec_$name"
    fs.delete(new Path(dir), true)
    dir
  }

  private def build(t: String, withBlooms: Boolean): Unit = {
    val opt = if (withBlooms) Seq("text" -> 1000L) else Nil
    TxLog.commit(spark, t,
      Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta")).toDF("id", "text"),
      append = true, collectTokenBlooms = opt)
    TxLog.commit(spark, t,
      Seq((3L, "epsilon zeta eta"), (4L, "zeta eta theta")).toDF("id", "text"),
      append = true, collectTokenBlooms = opt)
  }

  test("term probe prunes to the mentioning batch; results exact") {
    val t = fresh("term")
    build(t, withBlooms = true)
    val got = TxLog.readWhereToken(spark, t, "text", "alpha")
    assert(got.as[(Long, String)].collect().toSeq == Seq((1L, "alpha beta gamma")))
    val dirs = TxLog.manifest(spark, t).map(_._1)
    assert(got.inputFiles.forall(_.contains(dirs.head)),
      "the second batch (no 'alpha' in its bloom) must not be listed")
  }

  test("phrase probe (3-gram) prunes and matches only CONSECUTIVE tokens") {
    val t = fresh("phrase")
    build(t, withBlooms = true)
    val got = TxLog.readWhereToken(spark, t, "text", "beta gamma delta")
    assert(got.as[(Long, String)].collect().toSeq == Seq((2L, "beta gamma delta")))
    // words present but not consecutive -> no match
    assert(TxLog.readWhereToken(spark, t, "text", "alpha gamma").count() == 0L)
    // phrases longer than the bloomed grams are rejected loudly
    intercept[IllegalArgumentException] {
      TxLog.readWhereToken(spark, t, "text", "a b c d")
    }
  }

  test("bloom-less batches are conservatively kept (never a wrong prune)") {
    val t = fresh("legacy")
    build(t, withBlooms = false)
    val got = TxLog.readWhereToken(spark, t, "text", "epsilon")
    assert(got.count() == 1L)
    // all batches listed: nothing to prune on, nothing lost
    val dirs = TxLog.manifest(spark, t).map(_._1)
    assert(dirs.forall(d => got.inputFiles.exists(_.contains(d))))
  }

  test("absent term returns zero rows through the deterministic fallback") {
    val t = fresh("absent")
    build(t, withBlooms = true)
    assert(TxLog.readWhereToken(spark, t, "text", "nowhere").count() == 0L)
  }

  test("deletion vectors apply under a token-bloom read") {
    val t = fresh("dv")
    build(t, withBlooms = true)
    TxLog.deleteVectored(spark, t, "id", Some(1L), Some(1L))
    assert(TxLog.readWhereToken(spark, t, "text", "alpha").count() == 0L)
    assert(TxLog.readWhereToken(spark, t, "text", "beta").count() == 1L)
  }
}
