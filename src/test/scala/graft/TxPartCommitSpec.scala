package graft

import graft.sources.TxLog
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** commitPartitioned: one byCol-constant batch per value in one pass,
  * and the downstream effects that constancy buys.
  */
class TxPartCommitSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def fresh(name: String): String = {
    val dir = s"${GraftSession.scratchBase}/txpart_spec_$name"
    fs.delete(new Path(dir), true)
    dir
  }

  private val df = Seq(
    (1L, "en", "a"), (2L, "en", "b"), (3L, "de", "c"),
    (4L, "fr", "d"), (5L, "de", "e")).toDF("id", "lang", "s")

  test("one batch per value, byCol kept in the data, roundtrip exact") {
    val t = fresh("basic")
    TxLog.commitPartitioned(spark, t, df, "lang")
    val m = TxLog.manifest(spark, t)
    assert(m.size == 3)
    // every batch is byCol-CONSTANT in its committed footer stats
    assert(m.forall { case (_, st) =>
      st.get("lang").exists(cs => cs.min == cs.max) })
    val got = TxLog.read(spark, t).as[(Long, String, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == df.as[(Long, String, String)].collect().sortBy(_._1).toSeq)
  }

  test("null values land in their own batch and read back as null") {
    val t = fresh("nulls")
    val withNull = Seq((1L, Some("en"), "a"), (2L, None, "b"))
      .toDF("id", "lang", "s")
    TxLog.commitPartitioned(spark, t, withNull, "lang")
    assert(TxLog.manifest(spark, t).size == 2)
    val got = TxLog.read(spark, t).collect()
    assert(got.count(_.isNullAt(1)) == 1 && got.length == 2)
  }

  test("byCol filters prune to one batch at the manifest level") {
    val t = fresh("prune")
    TxLog.commitPartitioned(spark, t, df, "lang")
    val got = TxLog.readWhere(spark, t, "lang", Some("de"), Some("de"))
    assert(got.count() == 2L)
    val batchOfDe = TxLog.manifest(spark, t).collect {
      case (d, st) if st.get("lang").exists(_.min == "de") => d
    }
    assert(batchOfDe.size == 1)
    assert(got.inputFiles.forall(_.contains(batchOfDe.head)))
  }

  test("append mode carries prior batches and keeps the type guard") {
    val t = fresh("append")
    TxLog.commitPartitioned(spark, t, df, "lang")
    TxLog.commitPartitioned(spark, t,
      Seq((9L, "pt", "z")).toDF("id", "lang", "s"), "lang", append = true)
    assert(TxLog.manifest(spark, t).size == 4)
    assert(TxLog.read(spark, t).count() == 6L)
    intercept[IllegalArgumentException] {
      TxLog.commitPartitioned(spark, t,
        Seq(("oops", "en", "x")).toDF("id", "lang", "s"), "lang", append = true)
    }
  }

  test("no temp residue; overwrite replaces the snapshot") {
    val t = fresh("tmp")
    TxLog.commitPartitioned(spark, t, df, "lang")
    TxLog.commitPartitioned(spark, t,
      Seq((7L, "es", "q")).toDF("id", "lang", "s"), "lang")
    assert(!fs.exists(new Path(s"$t/.partcommit-tmp")))
    assert(TxLog.read(spark, t).count() == 1L)
    // history intact: the first partitioned snapshot still reads
    assert(TxLog.read(spark, t, Some(1L)).count() == 5L)
  }
}
