package graft

import graft.operators.Cdc
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CdcSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def base = Seq(
    (1L, "one", 10), (2L, "two", 20), (3L, "three", 30), (4L, "four", 40))
    .toDF("id", "text", "v")

  test("applyChanges: insert, update, delete, passthrough") {
    val ch = Seq(
      (2L, "TWO", 21, "U", 1),   // update 2
      (3L, "x", 0, "D", 1),      // delete 3
      (9L, "nine", 90, "I", 1))  // insert 9
      .toDF("id", "text", "v", "op", "seq")
    val got = Cdc.applyChanges(base, ch, "id")
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "one", 10), (2L, "TWO", 21), (4L, "four", 40), (9L, "nine", 90)))
  }

  test("applyChanges: last-writer-wins on conflicting changes per key") {
    val ch = Seq(
      (2L, "TWO-a", 21, "U", 1),
      (2L, "TWO-b", 22, "U", 3),  // highest seq wins
      (2L, "TWO-c", 23, "U", 2),
      (4L, "gone", 0, "D", 5),
      (4L, "back", 44, "U", 4))   // the later delete wins over this
      .toDF("id", "text", "v", "op", "seq")
    val got = Cdc.applyChanges(base, ch, "id")
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "one", 10), (2L, "TWO-b", 22), (3L, "three", 30)))
  }

  test("applyChanges: idempotent under re-application of the same batch") {
    val ch = Seq(
      (2L, "TWO", 21, "U", 1), (3L, "x", 0, "D", 1), (9L, "nine", 90, "I", 1))
      .toDF("id", "text", "v", "op", "seq")
    val once = Cdc.applyChanges(base, ch, "id")
    val twice = Cdc.applyChanges(once, ch, "id")
    assert(once.as[(Long, String, Int)].collect().sortBy(_._1).toSeq ==
      twice.as[(Long, String, Int)].collect().sortBy(_._1).toSeq)
  }

  test("incrementalAgg equals the full recompute over applyChanges output") {
    val b = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "b", 40L), (5L, "c", 50L))
      .toDF("id", "grp", "v")
    val ch = Seq(
      (2L, "a", 21L, "U", 1),   // update in place
      (3L, "b", 0L, "D", 1),    // delete from b
      (5L, "c", 0L, "D", 1),    // delete the ONLY c row -> group must vanish
      (9L, "d", 90L, "I", 1),   // insert creating a brand-new group
      (4L, "a", 41L, "U", 1))   // update MOVES row 4 from group b to a
      .toDF("id", "grp", "v", "op", "seq")
    val view = b.groupBy($"grp").agg(count(lit(1)).as("n"), sum($"v").as("total"))
    val inc = Cdc.incrementalAgg(view, b, ch, "id", "grp", "v")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    val full = Cdc.applyChanges(b, ch, "id")
      .groupBy($"grp").agg(count(lit(1)).as("n"), sum($"v").as("total"))
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(inc.toSeq == full.toSeq)
    // hand-check: a = {1:10, 2:21, 4:41}, d = {9:90}; b and c vanish
    assert(inc.toSeq == Seq(("a", 3L, 72L), ("d", 1L, 90L)), s"got ${inc.toSeq}")
  }

  test("diff: added/removed/changed classified exactly; same rows suppressed; nulls unambiguous") {
    val before = Seq(
      (1L, Option("a"), 10), (2L, Option("b"), 20),
      (3L, Option("c"), 30), (4L, None, 40))
      .toDF("id", "s", "v")
    val after = Seq(
      (1L, Option("a"), 10),  // same
      (2L, Option("B"), 20),  // changed
      (4L, Option(""), 40),   // changed: NULL -> empty string must NOT read as same
      (9L, Option("z"), 90))  // added; 3 removed
      .toDF("id", "s", "v")
    val got = Cdc.diff(before, after, "id")
      .as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "changed", 3L -> "removed", 4L -> "changed", 9L -> "added"))
    val counts = Cdc.diffSummary(before, after, "id")
      .as[(String, Long)].collect().toMap
    assert(counts == Map("changed" -> 2L, "removed" -> 1L, "added" -> 1L))
  }

  test("streamingCdcApply: streamed batches equal one-shot merge; untouched buckets untouched") {
    val base = s"${GraftSession.scratchBase}/graft_scdc_spec"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val rows = (1L to 40L).map(k => (k, s"t$k", k * 10)).toDF("id", "text", "v")
    rows.withColumn("__bucket", pmod(xxhash64($"id"), lit(8)).cast("string"))
      .write.partitionBy("__bucket").parquet(s"$base/state")
    // one change file touching three keys only
    val ch = Seq((2L, "TWO", 21L, "U", 1), (3L, "x", 0L, "D", 1), (99L, "new", 990L, "I", 1))
      .toDF("id", "text", "v", "op", "seq")
    ch.repartition(1).write.parquet(s"$base/in")
    val touchedBuckets = ch.select(pmod(xxhash64($"id"), lit(8)).cast("string"))
      .distinct().as[String].collect().toSet
    val before = fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/state"))
      .filter(_.isDirectory)
      .map(d => d.getPath.getName -> fs.listStatus(d.getPath)
        .map(f => (f.getPath.getName, f.getModificationTime)).toSet).toMap
    val got = graft.streaming.StreamingOps
      .streamingCdcApply(spark, s"$base/in", s"$base/state", "id")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    val want = Cdc.applyChanges(rows, ch, "id")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    // scale contract: buckets no change touched keep their exact files
    val after = fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/state"))
      .filter(_.isDirectory)
      .map(d => d.getPath.getName -> fs.listStatus(d.getPath)
        .map(f => (f.getPath.getName, f.getModificationTime)).toSet).toMap
    before.foreach { case (dir, files) =>
      val bucket = dir.stripPrefix("__bucket=")
      if (!touchedBuckets.contains(bucket))
        assert(after(dir) == files, s"untouched bucket $dir was rewritten")
    }
  }

  test("applyChanges: base side plans a broadcast anti-join (no base shuffle)") {
    val ch = Seq((2L, "TWO", 21, "U", 1)).toDF("id", "text", "v", "op", "seq")
    val plan = Cdc.applyChanges(base, ch, "id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join on the base side:\n$plan")
  }
}
