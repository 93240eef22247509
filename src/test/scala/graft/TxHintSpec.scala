package graft

import java.net.URI
import java.util.concurrent.atomic.AtomicLong

import graft.sources.TxLog
import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.scalatest.funsuite.AnyFunSuite

/** LIST-counting local FS (scheme `countfs://`): proves the `_latest`
  * hint makes latestVersion resolution listing-free — the object-store
  * metadata-scalability claim a wall-clock spec can't pin down.
  */
class CountingFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "countfs"
  override def getUri: URI = URI.create("countfs:///")
  override def listStatus(f: Path): Array[FileStatus] = {
    CountingFileSystem.lists.incrementAndGet()
    super.listStatus(f)
  }
  override def open(f: Path, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    CountingFileSystem.opens.incrementAndGet()
    super.open(f, bufferSize)
  }
}
object CountingFileSystem {
  val lists = new AtomicLong(0L)
  val opens = new AtomicLong(0L)
}

class TxHintSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  spark.sparkContext.hadoopConfiguration
    .set("fs.countfs.impl", classOf[CountingFileSystem].getName)

  private def localFs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def fresh(name: String): String = {
    val dir = s"${GraftSession.scratchBase}/txhint_spec_$name"
    localFs.delete(new Path(dir), true)
    dir
  }

  private def hint(t: String) = new Path(s"$t/_log/_latest")

  test("hint tracks commits; resolution survives every hint corruption") {
    val t = fresh("basic")
    (1 to 5).foreach(i =>
      TxLog.commit(spark, t, Seq((i.toLong, "x")).toDF("id", "s"), append = true))
    assert(TxLog.latestVersion(spark, t) == 5L)
    def writeHint(content: String): Unit = {
      val out = localFs.create(hint(t), true)
      out.write(content.getBytes("UTF-8")); out.close()
    }
    // stale hint (a crash between manifest write and hint update, or a
    // concurrent writer): forward probe recovers the true latest
    writeHint("2")
    assert(TxLog.latestVersion(spark, t) == 5L)
    // hint ahead of reality (corrupt): its manifest doesn't exist ->
    // fall back to the listing
    writeHint("99")
    assert(TxLog.latestVersion(spark, t) == 5L)
    // garbage hint -> listing
    writeHint("not-a-number")
    assert(TxLog.latestVersion(spark, t) == 5L)
    // missing hint (legacy table) -> listing
    localFs.delete(hint(t), false)
    assert(TxLog.latestVersion(spark, t) == 5L)
    // next commit restores the hint
    TxLog.commit(spark, t, Seq((6L, "x")).toDF("id", "s"), append = true)
    val in = localFs.open(hint(t))
    val got = try scala.io.Source.fromInputStream(in).mkString.trim
      finally in.close()
    assert(got == "6")
  }

  test("a fresh-hint resolution lists NO directories (countfs proof)") {
    val t = s"countfs://${GraftSession.scratchBase}/txhint_spec_count"
    val cfs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    cfs.delete(new Path(t), true)
    (1 to 3).foreach(i =>
      TxLog.commit(spark, t, Seq((i.toLong, "x")).toDF("id", "s"), append = true))
    CountingFileSystem.lists.set(0L)
    assert(TxLog.latestVersion(spark, t) == 3L)
    assert(CountingFileSystem.lists.get() == 0L,
      s"hinted resolution must not LIST (got ${CountingFileSystem.lists.get()})")
    // and without the hint the same call needs the listing fallback
    cfs.delete(new Path(s"$t/_log/_latest"), false)
    CountingFileSystem.lists.set(0L)
    assert(TxLog.latestVersion(spark, t) == 3L)
    assert(CountingFileSystem.lists.get() > 0L)
  }

  test("timestamp time travel resolves the snapshot current at the probe") {
    val t = fresh("ts")
    TxLog.commit(spark, t, Seq((1L, "a")).toDF("id", "s"))
    Thread.sleep(30)
    val between = System.currentTimeMillis()
    Thread.sleep(30)
    TxLog.commit(spark, t, Seq((2L, "b")).toDF("id", "s"), append = true)
    assert(TxLog.versionAt(spark, t, between) == 1L)
    assert(TxLog.versionAt(spark, t, System.currentTimeMillis() + 1000L) == 2L)
    assert(TxLog.readAsOfTimestamp(spark, t, between).count() == 1L)
    // before the table existed: loud failure, never a silent other read
    intercept[IllegalArgumentException] {
      TxLog.versionAt(spark, t, 1L)
    }
    // the batch format's timestampAsOf option resolves the same way
    assert(spark.read.format("txlog")
      .option("timestampAsOf", between.toString).load(t).count() == 1L)
  }

  test("format(\"txlog\") write path: overwrite/append/errorIfExists/ignore") {
    val t = fresh("wfmt")
    Seq((1L, "a")).toDF("id", "s").write.format("txlog").save(t)
    assert(TxLog.read(spark, t).count() == 1L)
    Seq((2L, "b")).toDF("id", "s").write.format("txlog")
      .mode("append").save(t)
    assert(TxLog.read(spark, t).count() == 2L)
    intercept[IllegalStateException] {
      Seq((3L, "c")).toDF("id", "s").write.format("txlog")
        .mode("errorifexists").save(t)
    }
    Seq((3L, "c")).toDF("id", "s").write.format("txlog")
      .mode("ignore").save(t)
    assert(TxLog.read(spark, t).count() == 2L)
    Seq((9L, "z")).toDF("id", "s").write.format("txlog")
      .mode("overwrite").save(t)
    assert(TxLog.read(spark, t).count() == 1L)
    // the write path honors stored constraints like every commit
    TxLog.addConstraint(spark, t, "id_pos", "id > 0")
    intercept[IllegalArgumentException] {
      Seq((-1L, "x")).toDF("id", "s").write.format("txlog")
        .mode("append").save(t)
    }
  }

  test("vacuumDryRun previews exactly what vacuum deletes") {
    val t = fresh("dry")
    (1 to 3).foreach(i =>
      TxLog.commit(spark, t, Seq((i.toLong, "x")).toDF("id", "s")))
    val (doomed, bytes) = TxLog.vacuumDryRun(spark, t, 3L)
    assert(doomed.nonEmpty && bytes > 0L)
    TxLog.vacuum(spark, t, 3L)
    doomed.foreach(p =>
      assert(!localFs.exists(new Path(p)), s"$p should be gone"))
    // post-vacuum dry run: nothing left to reclaim
    assert(TxLog.vacuumDryRun(spark, t, 3L)._1.isEmpty)
    assert(TxLog.read(spark, t).count() == 1L)
  }

  test("history records one row per version with its operation") {
    val t = fresh("hist")
    TxLog.commit(spark, t, Seq((1L, "a")).toDF("id", "s"))
    TxLog.commit(spark, t, Seq((2L, "b")).toDF("id", "s"), append = true)
    TxLog.deleteVectored(spark, t, "id", Some(1L), Some(1L))
    TxLog.purgeDeletes(spark, t)
    TxLog.restore(spark, t, 2L)
    val h = TxLog.history(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(h == Seq((5L, "restore"), (4L, "purge_deletes"),
      (3L, "delete_vectored"), (2L, "append"), (1L, "commit")))
    // timestamps are non-null and non-decreasing oldest-first
    val ts = TxLog.history(spark, t).collect().map(_.getLong(1)).reverse
    assert(ts.zip(ts.tail).forall { case (a, b) => a <= b })
    // vacuum drops the dropped versions' info rows too
    TxLog.vacuum(spark, t, 4L)
    assert(TxLog.history(spark, t).collect().map(_.getLong(0)).toSeq ==
      Seq(5L, 4L))
  }

  test("vacuum and restore keep resolving correctly under the hint") {
    val t = fresh("vac")
    (1 to 4).foreach(i =>
      TxLog.commit(spark, t, Seq((i.toLong, "x")).toDF("id", "s"), append = true))
    TxLog.restore(spark, t, 2L) // v5 = v2's lines
    assert(TxLog.latestVersion(spark, t) == 5L)
    TxLog.vacuum(spark, t, 5L)
    assert(TxLog.latestVersion(spark, t) == 5L)
    assert(TxLog.read(spark, t).count() == 2L)
  }

  test("manifest checkpoint: history + vacuum resolve with O(tail) metadata reads") {
    val t = s"countfs://${GraftSession.scratchBase}/txhint_spec_ckpt"
    val cfs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    cfs.delete(new Path(t), true)
    (1 to 25).foreach(i =>
      TxLog.commit(spark, t, Seq((i.toLong, "x")).toDF("id", "s")))
    // checkpoints landed at the every-10 cadence
    assert(cfs.exists(new Path(s"$t/_log/ckpt-v10")))
    assert(cfs.exists(new Path(s"$t/_log/ckpt-v20")))
    // history: versions <= 20 come from the checkpoint — one read —
    // and only the 5 tail versions open their own .info sidecar
    CountingFileSystem.opens.set(0L)
    val h = TxLog.history(spark, t).collect()
    assert(h.length == 25 && h.head.getLong(0) == 25L)
    assert(h.forall(r => r.getString(2) == "commit"))
    val historyOpens = CountingFileSystem.opens.get()
    assert(historyOpens <= 8L,
      s"history should read ckpt + 5 tail sidecars, opened $historyOpens files")
    // the checkpoint really is the source for covered versions: drop
    // their sidecars — rows still carry the op
    (1 to 20).foreach(v => cfs.delete(new Path(s"$t/_log/v$v.info"), false))
    val h2 = TxLog.history(spark, t).collect()
    assert(h2.count(_.getString(2) == "commit") == 25)
    // vacuum keep-set: manifest reads confined to the post-ckpt tail
    CountingFileSystem.opens.set(0L)
    val (doomed, _) = TxLog.vacuumDryRun(spark, t, 15L)
    val dryOpens = CountingFileSystem.opens.get()
    assert(dryOpens <= 10L,
      s"vacuumDryRun should read ckpt + 5 tail manifests, opened $dryOpens files")
    // versions 1-14 doomed (overwrite commits: one batch each)
    assert(doomed.count(_.contains("/_log/v")) >= 14)
    // the run-based keep-set is CORRECT: after the real vacuum, every
    // retained snapshot still reads, pre-retention dirs are gone
    TxLog.vacuum(spark, t, 15L)
    assert(TxLog.read(spark, t, Some(15L)).as[(Long, String)].collect()
      .toSeq == Seq((15L, "x")))
    assert(TxLog.read(spark, t).as[(Long, String)].collect()
      .toSeq == Seq((25L, "x")))
    val dataDirs = cfs.listStatus(new Path(s"$t/data")).length
    assert(dataDirs == 11, s"expected batches of v15..v25 only, got $dataDirs")
    // pre-retention checkpoint went with its versions; the surviving
    // tail still resolves history
    assert(!cfs.exists(new Path(s"$t/_log/ckpt-v10")))
    assert(TxLog.history(spark, t).collect().length == 11)
  }

  test("manifest checkpoint: runs survive append/delete/restore (vacuum keeps exactly the referenced)") {
    val t = fresh("ckptrun")
    // v1..v12 appends (ckpt at 10), then a delete rewrite and a restore
    (1 to 12).foreach(i =>
      TxLog.commit(spark, t, Seq((i.toLong, "x")).toDF("id", "s"), append = true))
    TxLog.deleteWhere(spark, t, "id", Some(1L), Some(3L)) // v13: rewrites 3 batches
    val v13 = TxLog.latestVersion(spark, t)
    TxLog.restore(spark, t, 12L) // v14: re-references the rewritten dirs
    (1 to 7).foreach(i => // push a ckpt PAST the restore (v20 > v14)
      TxLog.commit(spark, t,
        Seq((100L + i, "y")).toDF("id", "s"), append = true))
    assert(localFs.exists(new Path(s"$t/_log/ckpt-v20")))
    // retain from the restore point: v13's rewrite batch is UNREFERENCED
    // by [14, latest] and must go; all 12 original batches must stay
    TxLog.vacuum(spark, t, 14L)
    assert(TxLog.read(spark, t, Some(14L)).count() == 12L)
    assert(TxLog.read(spark, t).count() == 19L)
    intercept[Exception] { TxLog.read(spark, t, Some(v13)).count() }
  }
}
