package graft

import graft.sources.TxLog
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** compactSmall: metadata-only selection, surgical fold of the tiny
  * tail, big batches carried byte-verbatim.
  */
class TxCompactSmallSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def fresh(name: String): String = {
    val dir = s"${GraftSession.scratchBase}/txsmall_spec_$name"
    fs.delete(new Path(dir), true)
    dir
  }

  test("folds only the small tail; the big batch carries verbatim") {
    val t = fresh("fold")
    TxLog.commit(spark, t,
      (0L until 100L).map(i => (i, s"s$i")).toDF("id", "s"))
    (0 until 5).foreach { i =>
      TxLog.commit(spark, t,
        Seq((1000L + i, "tiny")).toDF("id", "s"), append = true)
    }
    val bigDir = TxLog.manifest(spark, t).map(_._1).head
    val v = TxLog.compactSmall(spark, t, minRows = 10L)
    assert(v.contains(7L))
    val after = TxLog.manifest(spark, t).map(_._1)
    assert(after.size == 2 && after.head == bigDir)
    assert(TxLog.read(spark, t).count() == 105L)
    // idempotent: the folded batch (5 rows) is still < minRows but it's
    // now ONE batch — below minBatches, so no further churn
    assert(TxLog.compactSmall(spark, t, minRows = 10L).isEmpty)
  }

  test("below minBatches: no-op, no version bump") {
    val t = fresh("noop")
    TxLog.commit(spark, t, (0L until 100L).map(i => (i, "x")).toDF("id", "s"))
    TxLog.commit(spark, t, Seq((500L, "tiny")).toDF("id", "s"), append = true)
    assert(TxLog.compactSmall(spark, t, minRows = 10L).isEmpty)
    assert(TxLog.latestVersion(spark, t) == 2L)
  }

  test("folding a vectored small batch materializes its vector") {
    val t = fresh("dv")
    (0 until 3).foreach { i =>
      TxLog.commit(spark, t,
        Seq((i * 10L, "a"), (i * 10L + 1L, "b")).toDF("id", "s"), append = true)
    }
    TxLog.deleteVectored(spark, t, "id", Some(11L), Some(11L))
    val v = TxLog.compactSmall(spark, t, minRows = 10L)
    assert(v.isDefined)
    assert(TxLog.read(spark, t).count() == 5L)
    // snapshot is vector-free again: metadata fast paths return
    assert(TxLog.statsAgg(spark, t, Seq("id")).isDefined)
  }

  test("stats-less legacy batches are never surprise-rewritten") {
    val t = fresh("legacy")
    TxLog.commit(spark, t, Seq((1L, "a")).toDF("id", "s"),
      collectStats = false)
    TxLog.commit(spark, t, Seq((2L, "b")).toDF("id", "s"), append = true)
    TxLog.commit(spark, t, Seq((3L, "c")).toDF("id", "s"), append = true)
    val legacyDir = TxLog.manifest(spark, t).map(_._1).head
    val v = TxLog.compactSmall(spark, t, minRows = 10L)
    assert(v.isDefined)
    assert(TxLog.manifest(spark, t).map(_._1).contains(legacyDir))
    assert(TxLog.read(spark, t).count() == 3L)
  }
}
