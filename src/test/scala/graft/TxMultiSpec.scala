package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** Multi-table atomic commit (round-11): the reference publishes
  * `times` + `missing_pairs` + `metadata` together per chunk
  * (utils/times.py:100-107); a crash between single-table commits
  * breaks the pair-count invariant (times + missing = n²). These specs
  * drive the REAL protocol pieces (stage/decide/publish) to construct
  * every crash window and prove [[TxLog.recoverMulti]] restores
  * all-or-nothing durability — including racing an interleaved
  * single-table commit and a double recovery.
  */
class TxMultiSpec extends AnyFunSuite {
  import SparkTestSession._

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def fresh(name: String): String = {
    val dir = s"${GraftSession.scratchBase}/mtx_$name"
    fs.delete(new Path(dir), true)
    dir
  }

  private def data(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).select(col("id").as("k"),
      (col("id") % 7L).as("g"), (col("id") * 2L).as("v"))

  private def meta(n: Long): DataFrame =
    spark.range(1).select(lit(n).as("n_pairs"))

  /** The cross-table invariant: times rows + missing rows == audited n. */
  private def consistent(times: String, missing: String, md: String): Boolean = {
    val t = TxLog.read(spark, times).count()
    val m = TxLog.read(spark, missing).count()
    val n = TxLog.read(spark, md).select(sum(col("n_pairs"))).head().getLong(0)
    t + m == n
  }

  private def txnFiles(txnDir: String): Seq[String] =
    if (!fs.exists(new Path(txnDir))) Nil
    else fs.listStatus(new Path(txnDir)).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("txn-")).sorted

  test("happy path: three tables advance together; txn dir left clean") {
    val (t, m, d, x) = (fresh("hp_t"), fresh("hp_m"), fresh("hp_d"), fresh("hp_x"))
    val vs = TxLog.commitMulti(spark, x, Seq(
      TxLog.MultiWrite(t, data(0L, 90L)),
      TxLog.MultiWrite(m, data(90L, 100L)),
      TxLog.MultiWrite(d, meta(100L))))
    assert(vs == Map(t -> 1L, m -> 1L, d -> 1L))
    assert(consistent(t, m, d))
    assert(txnFiles(x).isEmpty, "completed txn must leave no record")
    // append flavor: second transaction appends to all three
    val vs2 = TxLog.commitMulti(spark, x, Seq(
      TxLog.MultiWrite(t, data(100L, 180L), append = true),
      TxLog.MultiWrite(m, data(180L, 200L), append = true),
      TxLog.MultiWrite(d, meta(100L), append = true)))
    assert(vs2 == Map(t -> 2L, m -> 2L, d -> 2L))
    assert(TxLog.read(spark, t).count() == 170L)
    assert(consistent(t, m, d))
  }

  test("crash BEFORE the decision rolls back: nothing ever visible") {
    val (t, m, d, x) = (fresh("rb_t"), fresh("rb_m"), fresh("rb_d"), fresh("rb_x"))
    TxLog.commitMulti(spark, x, Seq(
      TxLog.MultiWrite(t, data(0L, 50L)), TxLog.MultiWrite(m, data(50L, 60L)),
      TxLog.MultiWrite(d, meta(60L))))
    // stage the second txn and DIE before deciding
    val (_, staged) = TxLog.stageMulti(spark, x, Seq(
      TxLog.MultiWrite(t, data(60L, 90L), append = true),
      TxLog.MultiWrite(m, data(90L, 100L), append = true),
      TxLog.MultiWrite(d, meta(40L), append = true)))
    assert(txnFiles(x).exists(_.endsWith(".staged")))
    // staged batches exist on disk but are INVISIBLE
    assert(TxLog.read(spark, t).count() == 50L)
    // a YOUNG intent belongs to a possibly-live coordinator between its
    // stage and decide steps: default recovery leaves it alone
    val recYoung = TxLog.recoverMulti(spark, x)
    assert(recYoung.rolledBack.isEmpty && recYoung.rolledForward.isEmpty,
      "recovery must not roll back a live transaction's fresh intent")
    assert(txnFiles(x).nonEmpty)
    // past the stale window (forced to 0 here) it is a crashed
    // coordinator and rolls back
    val rec = TxLog.recoverMulti(spark, x, staleAfterMs = 0L)
    assert(rec.rolledBack.size == 1 && rec.rolledForward.isEmpty)
    assert(txnFiles(x).isEmpty)
    // batch dirs erased, tables untouched, invariant holds
    staged.foreach(s =>
      assert(!fs.exists(new Path(s"${s.tableDir}/${s.batch}")),
        s"rolled-back batch ${s.batch} must be deleted"))
    assert(TxLog.latestVersion(spark, t) == 1L)
    assert(consistent(t, m, d))
  }

  test("crash AFTER the decision rolls forward, from any publish point") {
    val (t, m, d, x) = (fresh("rf_t"), fresh("rf_m"), fresh("rf_d"), fresh("rf_x"))
    TxLog.commitMulti(spark, x, Seq(
      TxLog.MultiWrite(t, data(0L, 50L)), TxLog.MultiWrite(m, data(50L, 60L)),
      TxLog.MultiWrite(d, meta(60L))))
    // decide, then die with ONE of three tables published — the exact
    // window where the reference's trio goes inconsistent
    val (id, staged) = TxLog.stageMulti(spark, x, Seq(
      TxLog.MultiWrite(t, data(60L, 90L), append = true),
      TxLog.MultiWrite(m, data(90L, 100L), append = true),
      TxLog.MultiWrite(d, meta(40L), append = true)))
    TxLog.decideMulti(spark, x, id, staged)
    TxLog.publishStaged(spark, staged.head)
    assert(TxLog.read(spark, t).count() == 80L, "first table published")
    assert(TxLog.read(spark, m).count() == 10L, "second table still old")
    assert(!consistent(t, m, d), "mid-crash state IS inconsistent")
    val rec = TxLog.recoverMulti(spark, x)
    assert(rec.rolledForward == Seq(id) && rec.rolledBack.isEmpty)
    assert(txnFiles(x).isEmpty)
    assert(TxLog.latestVersion(spark, t) == 2L,
      "roll-forward must not re-publish the already-committed table")
    assert(TxLog.read(spark, t).count() == 80L)
    assert(TxLog.read(spark, m).count() == 20L)
    assert(consistent(t, m, d))
    // recovery is idempotent: a second run finds nothing
    val rec2 = TxLog.recoverMulti(spark, x)
    assert(rec2.rolledForward.isEmpty && rec2.rolledBack.isEmpty)
  }

  test("roll-forward survives an interleaved commit; overwrite never clobbers a later one") {
    val (t, m, x) = (fresh("il_t"), fresh("il_m"), fresh("il_x"))
    TxLog.commit(spark, t, data(0L, 30L))
    TxLog.commit(spark, m, meta(30L))
    val (id, staged) = TxLog.stageMulti(spark, x, Seq(
      TxLog.MultiWrite(t, data(30L, 40L), append = true),
      TxLog.MultiWrite(m, meta(10L), append = true)))
    TxLog.decideMulti(spark, x, id, staged)
    // an unrelated writer lands BETWEEN decision and publish
    TxLog.commit(spark, t, data(100L, 105L), append = true)
    val rec = TxLog.recoverMulti(spark, x)
    assert(rec.rolledForward == Seq(id))
    // both the interleaved rows and the transaction's rows are present
    assert(TxLog.read(spark, t).count() == 45L)
    assert(TxLog.read(spark, m).agg(sum(col("n_pairs"))).head().getLong(0) == 40L)

    // OVERWRITE flavor: once published, a re-recovery (stale .commit
    // redelivered) must not clobber a commit that landed after it
    val (id2, staged2) = TxLog.stageMulti(spark, x, Seq(
      TxLog.MultiWrite(t, data(0L, 7L)))) // overwrite
    TxLog.decideMulti(spark, x, id2, staged2)
    staged2.foreach(s => TxLog.publishStaged(spark, s))
    // coordinator dies before deleting the .commit; a LATER overwrite wins
    TxLog.commit(spark, t, data(0L, 3L))
    val rec2 = TxLog.recoverMulti(spark, x)
    assert(rec2.rolledForward == Seq(id2))
    assert(TxLog.read(spark, t).count() == 3L,
      "recovery must not resurrect an overwrite a later commit replaced")
  }

  test("a truncated .commit is NOT a decision: rolls back from the intent") {
    val (t, x) = (fresh("tr_t"), fresh("tr_x"))
    TxLog.commit(spark, t, data(0L, 20L))
    val (id, staged) = TxLog.stageMulti(spark, x, Seq(
      TxLog.MultiWrite(t, data(20L, 40L), append = true)))
    // crash mid-decision: the .commit file exists but is cut short
    val out = fs.create(new Path(x, s"txn-$id.commit"), true)
    try out.write("mtxnv1\ngarbage-that-never-fini".getBytes("UTF-8"))
    finally out.close()
    val rec = TxLog.recoverMulti(spark, x, staleAfterMs = 0L)
    assert(rec.rolledBack == Seq(id) && rec.rolledForward.isEmpty)
    assert(TxLog.latestVersion(spark, t) == 1L)
    staged.foreach(s =>
      assert(!fs.exists(new Path(s"${s.tableDir}/${s.batch}"))))
    assert(txnFiles(x).isEmpty)
  }

  test("readConsistent hides a torn transaction; plain reads see the tear") {
    val (t, m, d, x) = (fresh("cc_t"), fresh("cc_m"), fresh("cc_d"), fresh("cc_x"))
    TxLog.commitMulti(spark, x, Seq(
      TxLog.MultiWrite(t, data(0L, 90L)), TxLog.MultiWrite(m, data(90L, 100L)),
      TxLog.MultiWrite(d, meta(100L))))
    val (id, staged) = TxLog.stageMulti(spark, x, Seq(
      TxLog.MultiWrite(t, data(100L, 180L), append = true),
      TxLog.MultiWrite(m, data(180L, 200L), append = true),
      TxLog.MultiWrite(d, meta(100L), append = true)))
    TxLog.decideMulti(spark, x, id, staged)
    TxLog.publishStaged(spark, staged.head) // only `times` published
    // plain latest reads are torn (the invariant is broken mid-flight)
    assert(!consistent(t, m, d))
    // the consistent cut shows the PRE-transaction state everywhere
    val cut = TxLog.consistentVersions(spark, x, Seq(t, m, d))
    assert(cut == Map(t -> 1L, m -> 1L, d -> 1L), s"cut was $cut")
    val dfs = TxLog.readConsistent(spark, x, Seq(t, m, d))
    val vis = dfs(t).count() + dfs(m).count()
    val aud = dfs(d).select(sum(col("n_pairs"))).head().getLong(0)
    assert(vis == aud && vis == 100L,
      s"consistent cut must hold the invariant: $vis visible, $aud audited")
    // a FULLY-published pending txn (coordinator died before forgetting)
    // is complete — the cut includes it
    staged.tail.foreach(s => TxLog.publishStaged(spark, s))
    val cut2 = TxLog.consistentVersions(spark, x, Seq(t, m, d))
    assert(cut2 == Map(t -> 2L, m -> 2L, d -> 2L), s"cut2 was $cut2")
    // after recovery the cut and the plain read agree
    TxLog.recoverMulti(spark, x)
    assert(consistent(t, m, d))
    // a table whose ONLY content is a torn txn reads as an empty frame
    val (t2, m2, x2) = (fresh("cc2_t"), fresh("cc2_m"), fresh("cc2_x"))
    TxLog.commit(spark, t2, data(0L, 10L))
    val (id2, staged2) = TxLog.stageMulti(spark, x2, Seq(
      TxLog.MultiWrite(t2, data(10L, 20L), append = true),
      TxLog.MultiWrite(m2, data(20L, 30L)))) // m2's FIRST ever content
    TxLog.decideMulti(spark, x2, id2, staged2)
    TxLog.publishStaged(spark, staged2.last) // m2 published, t2 not
    val dfs2 = TxLog.readConsistent(spark, x2, Seq(t2, m2))
    assert(dfs2(t2).count() == 10L, "unpublished table keeps its snapshot")
    assert(dfs2(m2).count() == 0L, "torn-only table reads empty")
    assert(dfs2(m2).columns.toSeq == Seq("k", "g", "v"),
      "empty frame carries the staged schema")
    TxLog.recoverMulti(spark, x2)
    assert(TxLog.read(spark, m2).count() == 10L)
  }

  test("vacuum spares an in-flight stage (grace); superseded dirs reclaim regardless of age") {
    val (t, x) = (fresh("vg_t"), fresh("vg_x"))
    TxLog.commit(spark, t, data(0L, 10L))
    TxLog.commit(spark, t, data(10L, 20L)) // overwrite: v1's dir superseded
    val (_, staged) = TxLog.stageMulti(spark, x, Seq(
      TxLog.MultiWrite(t, data(20L, 30L), append = true)))
    val stagedDir = new Path(s"$t/${staged.head.batch}")
    // default grace: the seconds-old SUPERSEDED dir goes, the
    // seconds-old NEVER-referenced staged dir survives
    TxLog.vacuum(spark, t, retainFrom = 2L)
    assert(fs.exists(stagedDir),
      "vacuum must not eat a batch whose manifest is still in flight")
    assert(fs.listStatus(new Path(s"$t/data")).length == 2,
      "the superseded v1 dir must reclaim regardless of age")
    // dry run agrees with the real vacuum on the sparing
    val (doomed, _) = TxLog.vacuumDryRun(spark, t, 2L)
    assert(!doomed.exists(_.contains(staged.head.batch.stripPrefix("data/"))))
    // grace 0 = the old reap-everything behavior (admin override)
    TxLog.vacuum(spark, t, retainFrom = 2L, inFlightGraceMs = 0L)
    assert(!fs.exists(stagedDir))
    // the txn is now unrecoverable-forward by design (never decided):
    // recovery rolls it back cleanly
    val rec = TxLog.recoverMulti(spark, x, staleAfterMs = 0L)
    assert(rec.rolledBack.size == 1)
  }

  test("a decided txn whose batches were reclaimed rolls BACK whole, never publishes missing dirs") {
    val (t, m, x) = (fresh("gv_t"), fresh("gv_m"), fresh("gv_x"))
    TxLog.commit(spark, t, data(0L, 10L))
    TxLog.commit(spark, m, meta(10L))
    val (id, staged) = TxLog.stageMulti(spark, x, Seq(
      TxLog.MultiWrite(t, data(10L, 20L), append = true),
      TxLog.MultiWrite(m, meta(10L), append = true)))
    TxLog.decideMulti(spark, x, id, staged)
    // a vacuum past the grace reclaimed BOTH staged batches before any
    // publish happened (coordinator long dead)
    staged.foreach(s =>
      fs.delete(new Path(s"${s.tableDir}/${s.batch}"), true))
    val rec = TxLog.recoverMulti(spark, x)
    assert(rec.rolledBack == Seq(id) && rec.rolledForward.isEmpty,
      "none-visible + batches gone must roll back, preserving all-or-nothing")
    assert(TxLog.latestVersion(spark, t) == 1L)
    assert(TxLog.read(spark, t).count() == 10L, "table must stay readable")
    assert(txnFiles(x).isEmpty)

    // TORN variant: one table published, the other's batch reclaimed —
    // recovery must fail LOUD, never publish a manifest over a missing dir
    val (id2, staged2) = TxLog.stageMulti(spark, x, Seq(
      TxLog.MultiWrite(t, data(20L, 30L), append = true),
      TxLog.MultiWrite(m, meta(10L), append = true)))
    TxLog.decideMulti(spark, x, id2, staged2)
    TxLog.publishStaged(spark, staged2.head)
    fs.delete(new Path(s"${staged2.last.tableDir}/${staged2.last.batch}"), true)
    val e = intercept[IllegalStateException](TxLog.recoverMulti(spark, x))
    assert(e.getMessage.contains("torn"))
    assert(TxLog.read(spark, m).count() == 1L, "m must stay readable")
    // operator resolution: remove the txn record explicitly
    assert(fs.delete(new Path(x, s"txn-$id2.commit"), false))
  }

  test("a stale .commit does not resurrect an overwrite vacuum already reclaimed") {
    val (t, x) = (fresh("rs_t"), fresh("rs_x"))
    TxLog.commit(spark, t, data(0L, 10L))
    // decided + fully published overwrite, but the coordinator died
    // before forgetting the .commit
    val (id, staged) = TxLog.stageMulti(spark, x, Seq(
      TxLog.MultiWrite(t, data(10L, 15L)))) // overwrite, v2
    TxLog.decideMulti(spark, x, id, staged)
    staged.foreach(s => TxLog.publishStaged(spark, s))
    // a LATER overwrite lands, then vacuum reclaims the txn's manifest
    // AND its superseded batch dir
    TxLog.commit(spark, t, data(0L, 3L)) // v3, current truth
    TxLog.vacuum(spark, t, retainFrom = 3L)
    val rec = TxLog.recoverMulti(spark, x)
    // the scan range has vacuumed holes, so "never published" is
    // unprovable: recovery classifies the write as published-then-
    // superseded and FORGETS the decision — the essential property is
    // that the CURRENT table state is never clobbered
    assert(rec.rolledForward == Seq(id) && rec.rolledBack.isEmpty,
      "a vacuumed-away publish must close forward without re-publishing")
    assert(TxLog.latestVersion(spark, t) == 3L)
    assert(TxLog.read(spark, t).count() == 3L,
      "current overwrite must survive recovery of a stale decision")
    assert(txnFiles(x).isEmpty)
  }

  test("decideMulti aborts when recovery claimed its intent (stalled coordinator)") {
    val (t, x) = (fresh("dc_t"), fresh("dc_x"))
    TxLog.commit(spark, t, data(0L, 10L))
    val (id, staged) = TxLog.stageMulti(spark, x, Seq(
      TxLog.MultiWrite(t, data(10L, 20L), append = true)))
    // the coordinator stalls past the stale window; a recovery rolls
    // its intent back
    assert(TxLog.recoverMulti(spark, x, staleAfterMs = 0L).rolledBack.size == 1)
    // the resumed coordinator must abort at its decision point, not
    // publish manifests over the reclaimed batch dirs
    val e = intercept[IllegalStateException](
      TxLog.decideMulti(spark, x, id, staged))
    assert(e.getMessage.contains("aborted"))
    assert(txnFiles(x).isEmpty, "the aborted decision must leave no record")
    assert(TxLog.latestVersion(spark, t) == 1L)
  }

  test("rollback's abort claim is atomic: a crashed claim resumes from the rolling marker") {
    val (t, x) = (fresh("rc_t"), fresh("rc_x"))
    TxLog.commit(spark, t, data(0L, 10L))
    val (id, staged) = TxLog.stageMulti(spark, x, Seq(
      TxLog.MultiWrite(t, data(10L, 20L), append = true)))
    // a recovery claims the abort (rename .staged → .rolling — the
    // round-12 fix for the decide-vs-rollback TOCTOU: the rename
    // consumes the unique claim token) and crashes mid-rollback
    assert(fs.rename(new Path(x, s"txn-$id.staged"),
      new Path(x, s"txn-$id.rolling")))
    // the claim alone already defeats a resumed coordinator — even
    // though the batch dirs are still fully intact
    val e = intercept[IllegalStateException](
      TxLog.decideMulti(spark, x, id, staged))
    assert(e.getMessage.contains("aborted"))
    // a later recovery RESUMES the rollback from the marker
    val rec = TxLog.recoverMulti(spark, x)
    assert(rec.rolledBack == Seq(id) && rec.rolledForward.isEmpty)
    staged.foreach(s =>
      assert(!fs.exists(new Path(s"${s.tableDir}/${s.batch}"))))
    assert(txnFiles(x).isEmpty)
    assert(TxLog.latestVersion(spark, t) == 1L)
  }

  test("a recorded-but-unclaimed decision: young is left to the coordinator, stale is finished by recovery") {
    val (t, m, x) = (fresh("uc_t"), fresh("uc_m"), fresh("uc_x"))
    TxLog.commit(spark, t, data(0L, 10L))
    TxLog.commit(spark, m, meta(10L))
    val (id, staged) = TxLog.stageMulti(spark, x, Seq(
      TxLog.MultiWrite(t, data(10L, 20L), append = true),
      TxLog.MultiWrite(m, meta(10L), append = true)))
    TxLog.decideMulti(spark, x, id, staged)
    // reconstruct the crash window BETWEEN record and claim: the
    // .committing marker is the renamed intent, so renaming it back
    // restores the exact pre-claim state (record present, unclaimed)
    assert(fs.rename(new Path(x, s"txn-$id.committing"),
      new Path(x, s"txn-$id.staged")))
    // young intent: the live coordinator is about to claim — recovery
    // must neither publish nor roll back
    val recYoung = TxLog.recoverMulti(spark, x)
    assert(recYoung.rolledForward.isEmpty && recYoung.rolledBack.isEmpty)
    assert(TxLog.latestVersion(spark, t) == 1L, "nothing published yet")
    // stale: the coordinator is dead — recovery claims the commit and
    // finishes the publish, so a recorded decision stays durable
    val rec = TxLog.recoverMulti(spark, x, staleAfterMs = 0L)
    assert(rec.rolledForward == Seq(id) && rec.rolledBack.isEmpty)
    assert(TxLog.read(spark, t).count() == 20L)
    assert(TxLog.read(spark, m).agg(sum(col("n_pairs"))).head().getLong(0) == 20L)
    assert(txnFiles(x).isEmpty)
  }

  test("crashed txn-file tmp writes are swept age-gated, never young ones") {
    val (t, x) = (fresh("tw_t"), fresh("tw_x"))
    TxLog.commit(spark, t, data(0L, 5L))
    fs.mkdirs(new Path(x))
    val tmp = new Path(x, "txn-deadbeef.staged.tmp-ab12cd34")
    val out = fs.create(tmp, true)
    try out.write("mtxnv1\ntrunca".getBytes("UTF-8")) finally out.close()
    TxLog.recoverMulti(spark, x) // young tmp: a live writer owns it
    assert(fs.exists(tmp), "a young tmp must survive recovery")
    TxLog.recoverMulti(spark, x, staleAfterMs = 0L)
    assert(!fs.exists(tmp), "a stale tmp is a crashed write — swept")
    assert(txnFiles(x).isEmpty)
  }

  test("validation failures abort zero-trace, before any sibling lands") {
    val (t, m, x) = (fresh("zt_t"), fresh("zt_m"), fresh("zt_x"))
    TxLog.commit(spark, t, data(0L, 10L))
    // duplicate table dirs rejected outright
    intercept[IllegalArgumentException](TxLog.commitMulti(spark, x, Seq(
      TxLog.MultiWrite(t, data(0L, 1L)), TxLog.MultiWrite(t, data(1L, 2L)))))
    // append type guard on one table vetoes the WHOLE transaction
    // before any batch dir is written for either
    val bad = spark.range(1).select(col("id").cast("string").as("k"),
      lit(0L).as("g"), lit(0L).as("v"))
    intercept[Exception](TxLog.commitMulti(spark, x, Seq(
      TxLog.MultiWrite(m, data(0L, 5L)),
      TxLog.MultiWrite(t, bad, append = true))))
    assert(!fs.exists(new Path(s"$m/data")) ||
      fs.listStatus(new Path(s"$m/data")).isEmpty,
      "no sibling batch may land when a validation fails")
    assert(txnFiles(x).isEmpty)
    assert(TxLog.latestVersion(spark, m) == 0L)
    assert(TxLog.latestVersion(spark, t) == 1L)
  }
}
