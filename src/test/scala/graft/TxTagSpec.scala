package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** Named cross-table snapshots (round-12): `TxLog.tag` persists a
  * [[TxLog.consistentVersions]] cut under a name; `readTag` pins every
  * table's `asOf` to it; vacuum respects tag pins exactly like consumer
  * acks. The reproducibility contract: "run X read exactly tag Y"
  * survives later commits, overwrites and retention policy.
  */
class TxTagSpec extends AnyFunSuite {
  import SparkTestSession._

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def fresh(name: String): String = {
    val dir = s"${GraftSession.scratchBase}/tag_$name"
    fs.delete(new Path(dir), true)
    dir
  }

  private def data(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).select(col("id").as("k"), (col("id") * 2L).as("v"))

  test("a tag pins the consistent cut: later commits and overwrites are invisible through it") {
    val root = fresh("pin")
    val (t, m, x) = (s"$root/t", s"$root/m", s"$root/x")
    TxLog.commitMulti(spark, x, Seq(
      TxLog.MultiWrite(t, data(0L, 50L)),
      TxLog.MultiWrite(m, data(50L, 60L))))
    val cut = TxLog.tag(spark, x, "run-1", Seq(t, m))
    assert(cut == Map(t -> 1L, m -> 1L))
    // later: an append on one table, a full OVERWRITE on the other
    TxLog.commit(spark, t, data(100L, 120L), append = true)
    TxLog.commit(spark, m, data(0L, 3L))
    assert(TxLog.read(spark, t).count() == 70L)
    val dfs = TxLog.readTag(spark, x, "run-1")
    assert(dfs(t).count() == 50L, "tagged read must see exactly v1")
    assert(dfs(m).count() == 10L, "overwrite must not leak into the tag")
    assert(TxLog.tagVersions(spark, x, "run-1") == cut)
    assert(TxLog.tags(spark, x) == Seq("run-1"))
    // immutable: re-tagging a live name fails before touching anything
    val e = intercept[IllegalStateException](
      TxLog.tag(spark, x, "run-1", Seq(t)))
    assert(e.getMessage.contains("immutable"))
  }

  test("tagging mid-torn-transaction pins the PRE-transaction cut (tag ≡ readConsistent)") {
    val root = fresh("torn")
    val (t, m, x) = (s"$root/t", s"$root/m", s"$root/x")
    TxLog.commitMulti(spark, x, Seq(
      TxLog.MultiWrite(t, data(0L, 40L)),
      TxLog.MultiWrite(m, data(40L, 50L))))
    // a second txn decided and HALF-published (the torn window)
    val (id, staged) = TxLog.stageMulti(spark, x, Seq(
      TxLog.MultiWrite(t, data(50L, 80L), append = true),
      TxLog.MultiWrite(m, data(80L, 90L), append = true)))
    TxLog.decideMulti(spark, x, id, staged)
    TxLog.publishStaged(spark, staged.head) // only t published
    val cut = TxLog.tag(spark, x, "pre", Seq(t, m))
    assert(cut == TxLog.consistentVersions(spark, x, Seq(t, m)),
      "the tag must persist exactly the consistent cut")
    assert(cut == Map(t -> 1L, m -> 1L), s"cut was $cut")
    val dfs = TxLog.readTag(spark, x, "pre")
    assert(dfs(t).count() == 40L && dfs(m).count() == 10L,
      "the tag shows the pre-transaction state everywhere")
    // recovery completes the txn; the tag STILL reads the old cut
    TxLog.recoverMulti(spark, x)
    assert(TxLog.read(spark, t).count() == 70L)
    assert(TxLog.readTag(spark, x, "pre")(t).count() == 40L)
  }

  test("vacuum refuses a tagged version (and the dry run agrees); dropTag unpins; force overrides") {
    val root = fresh("vac")
    val (t, x) = (s"$root/t", s"$root/x")
    TxLog.commitMulti(spark, x, Seq(TxLog.MultiWrite(t, data(0L, 20L))))
    TxLog.tag(spark, x, "keep", Seq(t))
    TxLog.commit(spark, t, data(0L, 5L)) // v2 overwrite
    TxLog.commit(spark, t, data(0L, 2L)) // v3
    val e = intercept[IllegalStateException](
      TxLog.vacuum(spark, t, retainFrom = 3L))
    assert(e.getMessage.contains("keep@v1"))
    intercept[IllegalStateException](TxLog.vacuumDryRun(spark, t, 3L))
    // retention at the pin is fine — the pinned manifest survives
    TxLog.vacuum(spark, t, retainFrom = 1L)
    assert(TxLog.readTag(spark, x, "keep")(t).count() == 20L)
    // dropTag: manifest gone first (readers), pins gone (vacuum free)
    TxLog.dropTag(spark, x, "keep")
    intercept[IllegalStateException](TxLog.readTag(spark, x, "keep"))
    assert(TxLog.tags(spark, x).isEmpty)
    TxLog.vacuum(spark, t, retainFrom = 3L)
    assert(TxLog.read(spark, t).count() == 2L)

    // force: break-glass reclaims a PINNED version knowingly
    val t2 = s"$root/t2"
    TxLog.commitMulti(spark, x, Seq(TxLog.MultiWrite(t2, data(0L, 9L))))
    TxLog.tag(spark, x, "doomed", Seq(t2))
    TxLog.commit(spark, t2, data(0L, 4L))
    TxLog.vacuum(spark, t2, retainFrom = 2L, force = true)
    // the tag's manifest version is gone: the pinned read fails LOUD
    intercept[Exception](
      TxLog.readTag(spark, x, "doomed")(t2).count())
  }

  test("tag names that the sweep filters would hide are rejected up front (r12 review)") {
    val root = fresh("tmp")
    val (t, x) = (s"$root/t", s"$root/x")
    TxLog.commitMulti(spark, x, Seq(TxLog.MultiWrite(t, data(0L, 5L))))
    // '.tmp-' anywhere in a name makes the pin invisible to tags() and
    // the vacuum gate (the atomic-write tmp infix filter) — a tag that
    // commits but silently never pins. Reject it before anything lands.
    val e = intercept[IllegalArgumentException](
      TxLog.tag(spark, x, "run.tmp-1", Seq(t)))
    assert(e.getMessage.contains("bad tag name"))
    assert(TxLog.tags(spark, x).isEmpty)
    assert(!fs.exists(new Path(s"$t/_log/tag-run.tmp-1")), "no pin litter")
  }

  test("dropTag on a crashed half-tag: loud without the tables, sweeps with them (r12 review)") {
    val root = fresh("half")
    val (t, x) = (s"$root/t", s"$root/x")
    TxLog.commitMulti(spark, x, Seq(TxLog.MultiWrite(t, data(0L, 10L))))
    TxLog.commit(spark, t, data(0L, 2L))
    // a crashed tag(): pin landed, manifest never committed
    val pin = new Path(s"$t/_log/tag-ghost")
    val out = fs.create(pin, true)
    try out.write("1".getBytes("UTF-8")) finally out.close()
    val ev = intercept[IllegalStateException](
      TxLog.vacuum(spark, t, retainFrom = 2L))
    assert(ev.getMessage.contains("ghost"), "the orphan pin still guards vacuum")
    // the documented cleanup path must not silently delete NOTHING: with
    // no manifest to enumerate pins from, dropTag demands the tables
    val ed = intercept[IllegalStateException](
      TxLog.dropTag(spark, x, "ghost"))
    assert(ed.getMessage.contains("pass the tables"))
    assert(fs.exists(pin), "a refused drop must not half-clean")
    TxLog.dropTag(spark, x, "ghost", tables = Seq(t))
    assert(!fs.exists(pin))
    TxLog.vacuum(spark, t, retainFrom = 2L) // now free
    // and a re-tag of the same name now succeeds from scratch
    TxLog.commit(spark, t, data(0L, 7L), append = true)
    TxLog.tag(spark, x, "ghost", Seq(t))
    assert(TxLog.tags(spark, x) == Seq("ghost"))
  }

  test("dropTag crashed between manifest and pins: a bare re-run finishes via the tombstone (r12 review)") {
    val root = fresh("tomb")
    val (t, x) = (s"$root/t", s"$root/x")
    TxLog.commitMulti(spark, x, Seq(TxLog.MultiWrite(t, data(0L, 10L))))
    TxLog.tag(spark, x, "keepish", Seq(t))
    TxLog.commit(spark, t, data(0L, 2L))
    // simulate the crash window: tombstone written, manifest deleted,
    // pin sweep never ran (exactly dropTag's state between its two
    // destructive steps)
    val enc = java.net.URLEncoder.encode(t, "UTF-8")
    val tomb = new Path(s"$x/tag-keepish.dropping")
    val out = fs.create(tomb, true)
    try out.write(enc.getBytes("UTF-8")) finally out.close()
    fs.delete(new Path(s"$x/tag-keepish"), false)
    assert(fs.exists(new Path(s"$t/_log/tag-keepish")), "pin survived the crash")
    assert(TxLog.tags(spark, x).isEmpty, "a .dropping tombstone is not a live tag")
    // the documented contract: re-run with NO arguments finishes
    TxLog.dropTag(spark, x, "keepish")
    assert(!fs.exists(new Path(s"$t/_log/tag-keepish")), "pin swept")
    assert(!fs.exists(tomb), "tombstone cleaned")
    TxLog.vacuum(spark, t, retainFrom = 2L) // nothing pins it anymore
  }

  test("a damaged tag pin is a loud vacuum error, never a silent unpin") {
    val root = fresh("dmg")
    val (t, x) = (s"$root/t", s"$root/x")
    TxLog.commitMulti(spark, x, Seq(TxLog.MultiWrite(t, data(0L, 10L))))
    TxLog.tag(spark, x, "good", Seq(t))
    TxLog.commit(spark, t, data(0L, 3L))
    val bad = new Path(s"$t/_log/tag-good")
    val out = fs.create(bad, true)
    try out.write("garbage".getBytes("UTF-8")) finally out.close()
    val e = intercept[IllegalStateException](
      TxLog.vacuum(spark, t, retainFrom = 2L))
    assert(e.getMessage.contains("unparsable"))
    TxLog.dropTag(spark, x, "good", tables = Seq(t))
    TxLog.vacuum(spark, t, retainFrom = 2L)
  }
}
