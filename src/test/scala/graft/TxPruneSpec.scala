package graft

import graft.sources.TxLog
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** The automatic manifest-pruning rule (TxPruneRule via
  * GraftExtensions): ordinary DataFrame filters over a registered
  * `TxLog.table` scan must skip non-overlapping batches at planning
  * time — and must NEVER change results or fire where soundness is not
  * proven (unregistered scans, time-travel file sets, OR predicates).
  */
class TxPruneSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def fresh(name: String): String = {
    val dir = s"${GraftSession.scratchBase}/txprune_spec_$name"
    fs.delete(new Path(dir), true)
    dir
  }

  private def quartileTable(name: String): String = {
    val t = fresh(name)
    Seq(0L, 100L, 200L, 300L).foreach { base =>
      TxLog.commit(spark, t,
        (base until base + 100L).map(i => (i, s"v$i")).toDF("id", "s"),
        append = true)
    }
    t
  }

  private def batchDirs(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.inputFiles.map(f => new Path(f).getParent.getName).toSet

  test("a plain filter over a registered table prunes at the manifest and stays exact") {
    val t = quartileTable("auto")
    val hit = TxLog.table(spark, t).filter($"id" >= 150L && $"id" <= 170L)
    assert(batchDirs(hit).size == 1,
      s"expected one batch dir after auto-prune, got ${batchDirs(hit)}")
    val expected = TxLog.read(spark, t)
      .filter($"id" >= 150L && $"id" <= 170L)
      .as[(Long, String)].collect().sorted.toSeq
    assert(hit.as[(Long, String)].collect().sorted.toSeq == expected)
    assert(hit.count() == 21)
  }

  test("point equality prunes; boundary rows survive") {
    val t = quartileTable("point")
    val one = TxLog.table(spark, t).filter($"id" === 205L)
    assert(batchDirs(one).size == 1)
    assert(one.as[(Long, String)].collect().toSeq == Seq((205L, "v205")))
    // inclusive boundaries: 199 and 200 live in different batches
    val edge = TxLog.table(spark, t).filter($"id" >= 199L && $"id" <= 200L)
    assert(batchDirs(edge).size == 2)
    assert(edge.count() == 2)
  }

  test("an unregistered scan with the same shape is never touched") {
    val t = quartileTable("unreg")
    // read() does not register; all four batches stay in the plan
    val df = TxLog.read(spark, t).filter($"id" >= 150L && $"id" <= 170L)
    assert(batchDirs(df).size == 4)
    assert(df.count() == 21)
  }

  test("OR predicates contribute no range: no prune, still correct") {
    val t = quartileTable("or")
    val df = TxLog.table(spark, t)
      .filter($"id" === 5L || $"id" === 305L)
    assert(batchDirs(df).size == 4, "OR must not prune (soundness)")
    assert(df.count() == 2)
  }

  test("non-range conjuncts are ignored but ranges still prune") {
    val t = quartileTable("mixed")
    val df = TxLog.table(spark, t)
      .filter($"id" >= 150L && $"id" <= 170L && $"s".contains("15"))
    assert(batchDirs(df).size == 1)
    assert(df.count() == 10) // v150..v159
  }

  test("time-travel reads (non-latest file set) never prune against the wrong manifest") {
    val t = fresh("tt")
    TxLog.commit(spark, t,
      (0L until 100L).map(i => (i, s"v$i")).toDF("id", "s"), append = true)
    val v1 = TxLog.latestVersion(spark, t)
    TxLog.commit(spark, t,
      (100L until 200L).map(i => (i, s"v$i")).toDF("id", "s"), append = true)
    graft.plans.TxPruneRule.register(t)
    // the v1 snapshot's file set != latest manifest -> rule must not fire
    val old = TxLog.read(spark, t, Some(v1)).filter($"id" >= 150L)
    assert(old.count() == 0)
    assert(batchDirs(old).size == 1) // v1's single batch, untouched
    // the latest snapshot does prune
    val cur = TxLog.table(spark, t).filter($"id" >= 150L)
    assert(batchDirs(cur).size == 1)
    assert(cur.count() == 50)
  }

  test("strict bounds widen conservatively; all-pruned filters return empty") {
    val t = quartileTable("strict")
    val df = TxLog.table(spark, t).filter($"id" > 399L)
    assert(df.count() == 0)
    val strict = TxLog.table(spark, t).filter($"id" > 99L && $"id" < 101L)
    assert(strict.as[(Long, String)].collect().toSeq == Seq((100L, "v100")))
  }

  test("string bounds prune through the rule in UTF-8 order") {
    val t = fresh("utf8")
    TxLog.commit(spark, t, Seq((1L, "🎉x")).toDF("id", "s"), append = true)
    TxLog.commit(spark, t, Seq((2L, "aa")).toDF("id", "s"), append = true)
    val got = TxLog.table(spark, t).filter($"s" >= "")
    // astral string ranks above "" in UTF-8; both batches overlap -> no prune,
    // but a probe above 'z' must keep ONLY the astral batch
    val hi = TxLog.table(spark, t).filter($"s" >= "zz")
    assert(batchDirs(hi).size == 1)
    assert(hi.as[(Long, String)].collect().toSeq == Seq((1L, "🎉x")))
    assert(got.count() == 2)
  }
}
