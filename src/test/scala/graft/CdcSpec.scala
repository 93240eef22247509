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

  private def scd2Rows(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "text", "v", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Int, Int, Option[Int], Boolean)]
      .collect().sortBy(r => (r._1, r._4)).toSeq

  test("scd2: versions open on I/U, close on any later change, deletes end history") {
    val ch = Seq(
      (2L, "TWO", 21, "U", 1),   // 2: v0 closed at 1, v1 current
      (3L, "x", 0, "D", 1),      // 3: v0 closed at 1, nothing current
      (9L, "nine", 90, "I", 1),  // 9: brand-new current version
      (2L, "TWO2", 22, "U", 3))  // 2: v1 closed at 3, v3 current
      .toDF("id", "text", "v", "op", "seq")
    val got = scd2Rows(Cdc.scd2(base, ch, "id"))
    assert(got == Seq(
      (1L, "one", 10, 0, None, true),
      (2L, "two", 20, 0, Some(1), false),
      (2L, "TWO", 21, 1, Some(3), false),
      (2L, "TWO2", 22, 3, None, true),
      (3L, "three", 30, 0, Some(1), false),
      (4L, "four", 40, 0, None, true),
      (9L, "nine", 90, 1, None, true)))
  }

  test("scd2Apply on a monotone second batch equals the full rebuild") {
    val ch1 = Seq(
      (2L, "TWO", 21, "U", 1), (3L, "x", 0, "D", 1), (9L, "nine", 90, "I", 1))
      .toDF("id", "text", "v", "op", "seq")
    val ch2 = Seq(
      (2L, "TWO2", 22, "U", 2),  // close 2's open version again
      (3L, "resurrected", 31, "I", 2), // re-insert a deleted key
      (4L, "gone", 0, "D", 3),   // delete an untouched-so-far key
      (9L, "NINE", 91, "U", 2))  // update the batch-1 insert
      .toDF("id", "text", "v", "op", "seq")
    val incremental = Cdc.scd2Apply(Cdc.scd2(base, ch1, "id"), ch2, "id")
    val full = Cdc.scd2(base, ch1.unionByName(ch2), "id")
    assert(scd2Rows(incremental) == scd2Rows(full))
  }

  test("asOfRead returns the covering version; pre-insert/post-delete keys vanish") {
    val ch = Seq(
      (2L, "TWO", 21, "U", 1),   // 2 updated at 1
      (3L, "x", 0, "D", 1),      // 3 deleted at 1
      (9L, "nine", 90, "I", 2))  // 9 born at 2
      .toDF("id", "text", "v", "op", "seq")
    val hist = Cdc.scd2(base, ch, "id")
    val probes = Seq((2L, 0), (2L, 1), (3L, 0), (3L, 1), (9L, 0), (9L, 2))
      .toDF("id", "at")
    val got = Cdc.asOfRead(hist, probes, "id", "at")
      .select("id", "at", "text")
      .as[(Long, Int, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (2L, 0, "two"),   // pre-update version
      (2L, 1, "TWO"),   // post-update version
      (3L, 0, "three"), // alive before the delete
      (9L, 2, "nine"))) // born at 2; (3,1) and (9,0) vanish
  }

  test("makePatch: applyChanges(before, patch) reproduces after; patch is minimal") {
    val before = base
    val after = Seq(
      (1L, "one", 10),    // unchanged
      (2L, "TWO", 21),    // changed
      (9L, "nine", 90))   // added; 3 and 4 removed
      .toDF("id", "text", "v")
    val patch = Cdc.makePatch(before, after, "id")
    val repaired = Cdc.applyChanges(before, patch, "id")
      .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
    assert(repaired == after.as[(Long, String, Int)].collect().sortBy(_._1).toSeq)
    // minimality: the untouched key never appears in the patch
    val ops = patch.select("id", "op").as[(Long, String)].collect().toSet
    assert(ops == Set((2L, "U"), (9L, "I"), (3L, "D"), (4L, "D")))
  }

  test("incrementalJoinDelta: maintained view equals the full recompute, bag semantics") {
    // duplicates on the join key on BOTH sides, and ΔA⋈ΔB pairs that a
    // naive ΔA⋈B ∪ A⋈ΔB (old B) would miss or a ΔA⋈Bnew ∪ Anew⋈ΔB
    // would double-count
    val aOld = Seq((1L, "a1"), (2L, "a2"), (2L, "a2x")).toDF("ka", "pa")
    val aDel = Seq((2L, "a2new"), (5L, "a5")).toDF("ka", "pa")
    val bOld = Seq((1L, "b1"), (2L, "b2")).toDF("kb", "pb")
    val bDel = Seq((2L, "b2new"), (5L, "b5"), (5L, "b5x")).toDF("kb", "pb")
    def bag(df: org.apache.spark.sql.DataFrame) = df
      .select(col("ka"), col("pa"), col("pb"))
      .as[(Long, String, String)].collect().sorted.toSeq
    val aNew = aOld.unionByName(aDel)
    val bNew = bOld.unionByName(bDel)
    val full = aNew.join(bNew, aNew("ka") === bNew("kb"))
    val maintained = aOld.join(bOld, aOld("ka") === bOld("kb"))
      .unionByName(Cdc.incrementalJoinDelta(aOld, aDel, bOld, bDel, "ka", "kb"))
    assert(bag(maintained) == bag(full),
      "incremental maintenance must equal the full recompute exactly")
    // scale shape: both delta joins broadcast the DELTA side
    val p = Cdc.incrementalJoinDelta(aOld, aDel, bOld, bDel, "ka", "kb")
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"both delta joins must be broadcast:\n$p")
  }

  test("scd2Apply: untouched keys pass through a broadcast anti-join") {
    val hist = Cdc.scd2(base,
      Seq((2L, "TWO", 21, "U", 1)).toDF("id", "text", "v", "op", "seq"), "id")
    val plan = Cdc.scd2Apply(hist,
      Seq((3L, "x", 0, "D", 2)).toDF("id", "text", "v", "op", "seq"), "id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join for untouched history:\n$plan")
  }
}
