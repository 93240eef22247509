package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TreeTxn

/** Atomic multi-tree publish (round-12): the hive-layout counterpart of
  * TxMultiSpec. The reference's flagship job writes times +
  * missing_pairs + metadata as three separate trees
  * (utils/times.py:100-107) — these specs construct every crash window
  * of the staged-tree protocol and prove [[TreeTxn.recover]] restores
  * all-or-nothing visibility of the final directories.
  */
class TreeTxnSpec extends AnyFunSuite {
  import SparkTestSession._

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def fresh(name: String): String = {
    val dir = s"${GraftSession.scratchBase}/ttx_$name"
    fs.delete(new Path(dir), true)
    dir
  }

  private def data(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).select(col("id").as("k"), (col("id") * 2L).as("v"))

  private def rows(dir: String): Long =
    if (!fs.exists(new Path(dir))) -1L
    else spark.read.parquet(dir).count()

  private def txnFiles(txnDir: String): Seq[String] =
    if (!fs.exists(new Path(txnDir))) Nil
    else fs.listStatus(new Path(txnDir)).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("txn-") || n.startsWith("stage-") ||
        n.startsWith("old-")).sorted

  test("happy path: trees appear together, txn dir left clean, overwrite set-aside reclaimed") {
    val root = fresh("hp")
    val (a, b) = (s"$root/out/a", s"$root/out/b")
    val x = s"$root/_txn"
    val tx = TreeTxn.begin(spark, x, Seq("a" -> a, "b" -> b))
    data(0L, 50L).write.parquet(tx.staged("a"))
    data(50L, 60L).write.parquet(tx.staged("b"))
    assert(rows(a) == -1L && rows(b) == -1L, "staged trees are invisible")
    tx.commit()
    assert(rows(a) == 50L && rows(b) == 10L)
    assert(txnFiles(x).isEmpty, "completed txn must leave no litter")
    // overwrite: a second txn replaces both; previous content set aside
    // during publish is reclaimed at forget
    val tx2 = TreeTxn.begin(spark, x, Seq("a" -> a, "b" -> b))
    data(0L, 7L).write.parquet(tx2.staged("a"))
    data(7L, 9L).write.parquet(tx2.staged("b"))
    tx2.commit()
    assert(rows(a) == 7L && rows(b) == 2L)
    assert(txnFiles(x).isEmpty)
  }

  test("crash between tree publishes: torn on disk, recovery completes the publish") {
    val root = fresh("cr")
    val (a, b, c) = (s"$root/out/a", s"$root/out/b", s"$root/out/c")
    val x = s"$root/_txn"
    val tx = TreeTxn.begin(spark, x, Seq("a" -> a, "b" -> b, "c" -> c))
    data(0L, 30L).write.parquet(tx.staged("a"))
    data(30L, 40L).write.parquet(tx.staged("b"))
    data(40L, 45L).write.parquet(tx.staged("c"))
    val e = intercept[RuntimeException](tx.commit {
      case "published:b" => throw new RuntimeException("injected-crash")
      case _ => ()
    })
    assert(e.getMessage == "injected-crash")
    assert(rows(a) == 30L && rows(b) == 10L && rows(c) == -1L,
      "mid-crash state IS torn")
    val rec = TreeTxn.recover(spark, x)
    assert(rec.rolledForward.size == 1 && rec.rolledBack.isEmpty)
    assert(rows(a) == 30L && rows(b) == 10L && rows(c) == 5L)
    assert(txnFiles(x).isEmpty)
    // idempotent: a second recovery finds nothing
    val rec2 = TreeTxn.recover(spark, x)
    assert(rec2.rolledForward.isEmpty && rec2.rolledBack.isEmpty)
  }

  test("crash during publish of an OVERWRITE keeps exactly one content visible") {
    val root = fresh("ow")
    val (a, b) = (s"$root/out/a", s"$root/out/b")
    val x = s"$root/_txn"
    val tx = TreeTxn.begin(spark, x, Seq("a" -> a, "b" -> b))
    data(0L, 20L).write.parquet(tx.staged("a"))
    data(20L, 30L).write.parquet(tx.staged("b"))
    tx.commit()
    // second txn overwrites both but dies after publishing only `a`
    val tx2 = TreeTxn.begin(spark, x, Seq("a" -> a, "b" -> b))
    data(0L, 3L).write.parquet(tx2.staged("a"))
    data(3L, 5L).write.parquet(tx2.staged("b"))
    intercept[RuntimeException](tx2.commit {
      case "published:a" => throw new RuntimeException("die")
      case _ => ()
    })
    assert(rows(a) == 3L && rows(b) == 10L, "torn overwrite mid-crash")
    val rec = TreeTxn.recover(spark, x)
    assert(rec.rolledForward.size == 1)
    assert(rows(a) == 3L && rows(b) == 2L, "recovery completes the overwrite")
    assert(txnFiles(x).isEmpty)
  }

  test("crash BEFORE the decision rolls back: final trees never change") {
    val root = fresh("rb")
    val (a, b) = (s"$root/out/a", s"$root/out/b")
    val x = s"$root/_txn"
    val tx = TreeTxn.begin(spark, x, Seq("a" -> a, "b" -> b))
    data(0L, 20L).write.parquet(tx.staged("a"))
    data(20L, 30L).write.parquet(tx.staged("b"))
    tx.commit()
    // stage a second txn and DIE before commit: only the staging beacon
    // and the staged trees exist
    val tx2 = TreeTxn.begin(spark, x, Seq("a" -> a, "b" -> b))
    data(0L, 99L).write.parquet(tx2.staged("a"))
    // a young in-flight staging is LEFT ALONE (the job may be alive)
    val recYoung = TreeTxn.recover(spark, x)
    assert(recYoung.rolledForward.isEmpty && recYoung.rolledBack.isEmpty)
    assert(fs.exists(new Path(tx2.staged("a"))))
    // stale: dead job's litter — swept, final trees untouched
    val rec = TreeTxn.recover(spark, x, staleAfterMs = 0L)
    assert(rec.rolledBack.size == 1 && rec.rolledForward.isEmpty)
    assert(rows(a) == 20L && rows(b) == 10L)
    assert(txnFiles(x).isEmpty)
  }

  test("a claimed decision with ZERO publishes done still rolls forward whole") {
    val root = fresh("cl")
    val (a, b) = (s"$root/out/a", s"$root/out/b")
    val x = s"$root/_txn"
    val tx = TreeTxn.begin(spark, x, Seq("a" -> a, "b" -> b))
    data(0L, 10L).write.parquet(tx.staged("a"))
    data(10L, 15L).write.parquet(tx.staged("b"))
    // die right after the claim, before ANY tree publishes — "decided"
    // must mean durable even though nothing is visible yet
    intercept[RuntimeException](tx.commit {
      case "claimed" => throw new RuntimeException("die")
      case _ => ()
    })
    assert(rows(a) == -1L && rows(b) == -1L, "nothing visible at crash")
    val rec = TreeTxn.recover(spark, x)
    assert(rec.rolledForward.size == 1 && rec.rolledBack.isEmpty)
    assert(rows(a) == 10L && rows(b) == 5L)
    assert(txnFiles(x).isEmpty)
  }

  test("commit joins a recovery that finished the publish on its behalf (r12 review)") {
    val root = fresh("join")
    val (a, b) = (s"$root/out/a", s"$root/out/b")
    val x = s"$root/_txn"
    val tx = TreeTxn.begin(spark, x, Seq("a" -> a, "b" -> b))
    data(0L, 12L).write.parquet(tx.staged("a"))
    data(12L, 16L).write.parquet(tx.staged("b"))
    // the coordinator stalls between RECORDING the decision and CLAIMING
    // it; a recovery finds the stale intent + readable record, claims
    // commit on the coordinator's behalf, publishes everything and
    // forgets. The resumed coordinator must report SUCCESS (the trees
    // are live), not a spurious "rolled back" abort.
    tx.commit {
      case "recorded" =>
        val rec = TreeTxn.recover(spark, x, staleAfterMs = 0L)
        assert(rec.rolledForward == Seq(tx.id), s"recovery must claim-commit, got $rec")
      case _ => ()
    }
    assert(rows(a) == 12L && rows(b) == 4L)
    assert(txnFiles(x).isEmpty, "joined commit leaves no litter")
  }

  test("a published tree captured into the set-aside is restored, never lost (r12 review)") {
    val root = fresh("cap")
    val (a, b) = (s"$root/out/a", s"$root/out/b")
    val x = s"$root/_txn"
    val tx = TreeTxn.begin(spark, x, Seq("a" -> a, "b" -> b))
    data(0L, 8L).write.parquet(tx.staged("a"))
    data(8L, 11L).write.parquet(tx.staged("b"))
    intercept[RuntimeException](tx.commit {
      case "published:a" => throw new RuntimeException("die")
      case _ => ()
    })
    // simulate the racing-publisher interleave the review named: a
    // concurrent set-aside renames the freshly PUBLISHED tree `a` into
    // old-<id> (the marker travels with it); dst is left empty and the
    // staged tree is already consumed. A naive roll-forward sees
    // "staged gone, no marker at dst" and gives up — worse, the old
    // forget would then delete the only copy.
    val old = new Path(s"$x/old-${tx.id}/a")
    fs.mkdirs(old.getParent)
    assert(fs.rename(new Path(a), old), "capture the published tree")
    assert(rows(a) == -1L, "dst gone — the torn middle")
    val rec = TreeTxn.recover(spark, x)
    assert(rec.rolledForward == Seq(tx.id))
    assert(rows(a) == 8L && rows(b) == 3L,
      "recovery restores the captured tree from the set-aside")
    assert(txnFiles(x).isEmpty)
  }

  test("commit on a never-staged tree aborts before anything becomes visible") {
    val root = fresh("ns")
    val (a, b) = (s"$root/out/a", s"$root/out/b")
    val x = s"$root/_txn"
    val tx = TreeTxn.begin(spark, x, Seq("a" -> a, "b" -> b))
    data(0L, 4L).write.parquet(tx.staged("a"))
    data(4L, 6L).write.parquet(tx.staged("b"))
    tx.commit()
    val tx2 = TreeTxn.begin(spark, x, Seq("a" -> a, "b" -> b))
    data(0L, 2L).write.parquet(tx2.staged("a")) // "b" never staged
    intercept[IllegalArgumentException](tx2.commit())
    assert(rows(a) == 4L && rows(b) == 2L, "failed commit changed nothing")
    TreeTxn.recover(spark, x, staleAfterMs = 0L) // sweep the litter
    assert(txnFiles(x).isEmpty)
  }
}
