package graft

import graft.sources.TxLog
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic file pruning (DynPruneRule via GraftExtensions): an
  * equi-join between a registered `TxLog.table` scan and a small dim
  * plan must skip fact batches that cannot hold any dim key — proved
  * via `inputFiles` — and must NEVER change results or fire where
  * soundness is not proven (non-deterministic dims, time travel,
  * anti-joins, outer sides whose rows survive without a match).
  */
class DynPruneSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def fresh(name: String): String = {
    val dir = s"${GraftSession.scratchBase}/dynprune_spec_$name"
    fs.delete(new Path(dir), true)
    dir
  }

  /** Four key-range batches: [0,100), [100,200), [200,300), [300,400). */
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

  test("scattered dim keys prune to exactly the batches holding them") {
    val t = quartileTable("set")
    // keys in batch 0 and batch 2 only — a [min,max] range would keep
    // batch 1 too, so surviving with TWO dirs proves SET semantics
    val dim = Seq(5L, 7L, 205L).toDF("id")
    val joined = TxLog.table(spark, t).join(dim, Seq("id"))
    assert(batchDirs(joined).size == 2,
      s"expected two batch dirs, got ${batchDirs(joined)}")
    val expected = TxLog.read(spark, t).join(dim, Seq("id"))
      .as[(Long, String)].collect().sorted.toSeq
    assert(joined.as[(Long, String)].collect().sorted.toSeq == expected)
    assert(joined.count() == 3)
  }

  test("over the key cap the rule degrades to a min/max range probe") {
    val t = quartileTable("cap")
    val saved = graft.plans.DynPruneRule.maxKeys
    graft.plans.DynPruneRule.maxKeys = 4
    try {
      // 6 keys > cap of 4, all inside batches 1-2: range [105,299]
      val dim = Seq(105L, 110L, 115L, 290L, 295L, 299L).toDF("id")
      val joined = TxLog.table(spark, t).join(dim, Seq("id"))
      assert(batchDirs(joined).size == 2,
        s"range fallback should keep batches 1 and 2, got ${batchDirs(joined)}")
      assert(joined.count() == 6)
    } finally graft.plans.DynPruneRule.maxKeys = saved
  }

  test("left semi prunes the left scan; results match the unpruned semi") {
    val t = quartileTable("semi")
    val dim = Seq(301L, 305L).toDF("id")
    val semi = TxLog.table(spark, t).join(dim, Seq("id"), "left_semi")
    assert(batchDirs(semi).size == 1)
    val expected = TxLog.read(spark, t).join(dim, Seq("id"), "left_semi")
      .as[(Long, String)].collect().sorted.toSeq
    assert(semi.as[(Long, String)].collect().sorted.toSeq == expected)
  }

  test("left outer: the preserved (left) scan is NOT pruned, the nullable right side is") {
    val t = quartileTable("outer")
    val dim = Seq(5L, 7L).toDF("id")
    // fact LEFT of a left-outer join: every fact row survives — pruning
    // the scan would LOSE rows, so the rule must not touch it
    val preserved = TxLog.table(spark, t).join(dim, Seq("id"), "left_outer")
    assert(batchDirs(preserved).size == 4,
      "preserved side of an outer join must never be pruned")
    assert(preserved.count() == 400)
    // fact RIGHT of a left-outer join: fact rows only appear on a key
    // match — prunable
    val t2 = quartileTable("outer2")
    val nullable = dim.join(TxLog.table(spark, t2), Seq("id"), "left_outer")
    assert(batchDirs(nullable).size == 1)
    val expected = dim.join(TxLog.read(spark, t2), Seq("id"), "left_outer")
      .as[(Long, String)].collect().sorted.toSeq
    assert(nullable.as[(Long, String)].collect().sorted.toSeq == expected)
  }

  test("anti-join is never pruned (non-matching rows must survive)") {
    val t = quartileTable("anti")
    val dim = Seq(5L).toDF("id")
    val anti = TxLog.table(spark, t).join(dim, Seq("id"), "left_anti")
    assert(batchDirs(anti).size == 4)
    assert(anti.count() == 399)
  }

  test("non-deterministic dim declines (planning-time keys could differ from execution)") {
    val t = quartileTable("rand")
    val dim = spark.range(10)
      .select((org.apache.spark.sql.functions.rand(42) * 0).cast("long")
        .plus($"id" % 3 + 5).as("id"))
    val joined = TxLog.table(spark, t).join(dim, Seq("id"))
    assert(batchDirs(joined).size == 4,
      "a dim containing rand() must not drive pruning")
  }

  test("time-travel reads are never pruned against the latest manifest") {
    val t = quartileTable("tt")
    val v2 = 2L // first two batches
    val dim = Seq(5L).toDF("id")
    val old = spark.read.format("txlog").option("versionAsOf", v2)
      .load(t).join(dim, Seq("id"))
    // version 2 has two batches; pruning (against the LATEST manifest)
    // must not fire on its non-latest file set
    assert(batchDirs(old).size == 2)
    assert(old.count() == 1)
  }

  test("an empty dim prunes everything and the join is exactly empty") {
    val t = quartileTable("empty")
    val dim = Seq.empty[Long].toDF("id")
    val joined = TxLog.table(spark, t).join(dim, Seq("id"))
    assert(joined.count() == 0)
    assert(batchDirs(joined).isEmpty,
      s"no batch can match an empty key set, got ${batchDirs(joined)}")
  }

  test("null fact keys never block pruning (equi-joins never match null)") {
    val t = fresh("nulls")
    TxLog.commit(spark, t,
      Seq((Some(1L), "a"), (None: Option[Long], "n1")).toDF("id", "s"),
      append = true)
    TxLog.commit(spark, t,
      Seq((Some(100L), "b"), (None: Option[Long], "n2")).toDF("id", "s"),
      append = true)
    val dim = Seq(100L).toDF("id")
    val joined = TxLog.table(spark, t).join(dim, Seq("id"))
    assert(joined.as[(Long, String)].collect().toSeq == Seq((100L, "b")))
    assert(batchDirs(joined).size == 1,
      "the batch whose stats exclude every key prunes even though it holds nulls")
  }

  test("committed blooms prune point keys where every batch range overlaps") {
    val t = fresh("bloom")
    // interleaved keys: both batches span [0,99] so min/max can't
    // separate them; the commit-recorded bloom can
    val evens = (0L until 100L by 2).map(i => (i, s"e$i"))
    val odds = (1L until 100L by 2).map(i => (i, s"o$i"))
    TxLog.commit(spark, t, evens.toDF("id", "s"), append = true,
      collectBlooms = Seq("id" -> 1000L))
    TxLog.commit(spark, t, odds.toDF("id", "s"), append = true,
      collectBlooms = Seq("id" -> 1000L))
    val dim = Seq(42L).toDF("id")
    val joined = TxLog.table(spark, t).join(dim, Seq("id"))
    assert(batchDirs(joined).size == 1,
      s"bloom should exclude the odd batch, got ${batchDirs(joined)}")
    assert(joined.as[(Long, String)].collect().toSeq == Seq((42L, "e42")))
  }
}
