package graft

import graft.sources.TxLog
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deletion vectors (merge-on-read deletes): tombstones instead of
  * rewrites, every read path applies them, every metadata fast path
  * declines while they exist, purge re-materializes.
  */
class TxDvSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def fresh(name: String): String = {
    val dir = s"${GraftSession.scratchBase}/txdv_spec_$name"
    fs.delete(new Path(dir), true)
    dir
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, String)].collect().sortBy(_._1).toSeq

  private def batchDirs(t: String, v: Long): Seq[String] =
    TxLog.manifest(spark, t, Some(v)).map(_._1)

  private def quartiles(t: String): Unit =
    (0L until 4L).foreach { i =>
      TxLog.commit(spark, t,
        (i * 10L until i * 10L + 10L).map(k => (k, s"s$k")).toDF("id", "s"),
        append = true)
    }

  test("deleteVectored: rows gone, files untouched, line order kept") {
    val t = fresh("basic")
    quartiles(t)
    val before = batchDirs(t, 4L)
    val v = TxLog.deleteVectored(spark, t, "id", Some(13L), Some(16L))
    assert(v == 5L)
    // merge-on-read: the new version references the SAME batch dirs
    assert(batchDirs(t, 5L) == before)
    val got = rows(TxLog.read(spark, t))
    assert(got.map(_._1) == (0L until 40L).filterNot(k => k >= 13L && k <= 16L))
    // only the touched quartile's vector exists; data bytes unwritten
    assert(fs.listStatus(new Path(s"$t/dv")).length == 1)
  }

  test("time travel: the pre-delete snapshot still has the rows") {
    val t = fresh("tt")
    quartiles(t)
    TxLog.deleteVectored(spark, t, "id", Some(13L), Some(16L))
    assert(rows(TxLog.read(spark, t, Some(4L))).size == 40)
    assert(rows(TxLog.read(spark, t, Some(5L))).size == 36)
  }

  test("cumulative: a second delete on the same batch unions tombstones") {
    val t = fresh("cum")
    quartiles(t)
    TxLog.deleteVectored(spark, t, "id", Some(13L), Some(14L))
    TxLog.deleteVectored(spark, t, "id", Some(16L), Some(16L))
    val got = rows(TxLog.read(spark, t)).map(_._1)
    assert(got == (0L until 40L).filterNot(k => Set(13L, 14L, 16L)(k)))
    // idempotence of overlap: re-deleting an already-tombstoned row
    TxLog.deleteVectored(spark, t, "id", Some(13L), Some(16L))
    assert(rows(TxLog.read(spark, t)).map(_._1) ==
      (0L until 40L).filterNot(k => k >= 13L && k <= 16L))
  }

  test("null keys survive a vectored delete (SQL delete semantics)") {
    val t = fresh("nulls")
    TxLog.commit(spark, t, Seq((Some(1L), "a"), (None, "n"), (Some(5L), "e"))
      .toDF("id", "s"))
    TxLog.deleteVectored(spark, t, "id", Some(0L), Some(9L))
    val got = TxLog.read(spark, t).collect()
    assert(got.length == 1 && got(0).isNullAt(0) && got(0).getString(1) == "n")
  }

  test("readWhere applies vectors under manifest pruning") {
    val t = fresh("rw")
    quartiles(t)
    TxLog.deleteVectored(spark, t, "id", Some(13L), Some(16L))
    val got = TxLog.readWhere(spark, t, "id", Some(10L), Some(19L))
    assert(rows(got).map(_._1) == Seq(10L, 11L, 12L, 17L, 18L, 19L))
    // pruning still fires: only the touched quartile's files scan
    assert(got.inputFiles.forall(f =>
      f.contains(batchDirs(t, 5L)(1)) || f.contains("/dv/")))
  }

  test("metadata fast paths decline while a vector exists, return after purge") {
    val t = fresh("meta")
    quartiles(t)
    assert(TxLog.statsAgg(spark, t, Seq("id")).isDefined)
    TxLog.deleteVectored(spark, t, "id", Some(13L), Some(16L))
    assert(TxLog.statsAgg(spark, t, Seq("id")).isEmpty)
    assert(TxLog.approxDistinct(spark, t, "id").isEmpty)
    // the TxAgg rule path declines too: a registered count must SCAN
    // and therefore see the post-delete truth, not stale manifest rows
    graft.plans.TxPruneRule.register(t)
    assert(TxLog.table(spark, t).count() == 36L)
    val vPurge = TxLog.purgeDeletes(spark, t)
    assert(TxLog.statsAgg(spark, t, Seq("id")).isDefined)
    assert(TxLog.read(spark, t, Some(vPurge)).count() == 36L)
  }

  test("purgeDeletes rewrites ONLY vector batches; others carry verbatim") {
    val t = fresh("purge")
    quartiles(t)
    val before = batchDirs(t, 4L)
    TxLog.deleteVectored(spark, t, "id", Some(13L), Some(16L))
    val v = TxLog.purgeDeletes(spark, t)
    val after = batchDirs(t, v)
    // three untouched quartiles keep their dirs; the vector batch is new
    assert(after.take(3).toSet.subsetOf(before.toSet) ||
      before.toSet.intersect(after.toSet).size == 3)
    assert(after.size == 4)
    assert(rows(TxLog.read(spark, t)).size == 36)
    // purge is a no-op when nothing carries a vector
    assert(TxLog.purgeDeletes(spark, t) == v)
    // vacuum reclaims the superseded vector file once history drops
    TxLog.vacuum(spark, t, v)
    assert(!fs.exists(new Path(s"$t/dv")) ||
      fs.listStatus(new Path(s"$t/dv")).isEmpty)
  }

  test("vacuum keeps vectors referenced by retained snapshots") {
    val t = fresh("vac")
    quartiles(t)
    val vDel = TxLog.deleteVectored(spark, t, "id", Some(13L), Some(16L))
    TxLog.commit(spark, t, Seq((100L, "x")).toDF("id", "s"), append = true)
    TxLog.vacuum(spark, t, vDel) // retain the vectored snapshot
    assert(rows(TxLog.read(spark, t, Some(vDel))).size == 36)
    assert(rows(TxLog.read(spark, t)).size == 37)
  }

  test("deleteWhere on a vectored batch does not resurrect tombstones") {
    val t = fresh("dw")
    quartiles(t)
    TxLog.deleteVectored(spark, t, "id", Some(13L), Some(14L))
    // copy-on-write delete touching the SAME batch: must fold the
    // vector in, not resurrect 13/14
    TxLog.deleteWhere(spark, t, "id", Some(16L), Some(16L))
    assert(rows(TxLog.read(spark, t)).map(_._1) ==
      (0L until 40L).filterNot(k => Set(13L, 14L, 16L)(k)))
  }

  test("merge refuses a vectored candidate batch; accepts after purge") {
    val t = fresh("merge")
    quartiles(t)
    TxLog.deleteVectored(spark, t, "id", Some(13L), Some(14L))
    val src = Seq((15L, "UPD")).toDF("id", "s")
    val e = intercept[IllegalStateException] {
      TxLog.merge(spark, t, src, "id")
    }
    assert(e.getMessage.contains("purgeDeletes"))
    // a merge whose key range misses every vectored batch is fine
    TxLog.merge(spark, t, Seq((35L, "UPD")).toDF("id", "s"), "id")
    assert(rows(TxLog.read(spark, t)).count(_._2 == "UPD") == 1)
    TxLog.purgeDeletes(spark, t)
    TxLog.merge(spark, t, src, "id")
    assert(rows(TxLog.read(spark, t)).count(_._2 == "UPD") == 2)
  }

  test("mergeVectored ≡ copy-on-write merge, with zero data rewrites") {
    val t1 = fresh("mv_a"); val t2 = fresh("mv_b")
    quartiles(t1); quartiles(t2)
    val src = Seq((13L, "UPD"), (16L, "UPD"), (100L, "NEW")).toDF("id", "s")
    TxLog.merge(spark, t1, src, "id")
    val before = batchDirs(t2, 4L)
    TxLog.mergeVectored(spark, t2, src, "id")
    assert(rows(TxLog.read(spark, t1)) == rows(TxLog.read(spark, t2)))
    // zero rewrites: all four original dirs still referenced + ONE
    // delta-sized append; the tombstones live in a vector sidecar
    val after = batchDirs(t2, 5L)
    assert(after.take(4) == before && after.size == 5)
    assert(fs.listStatus(new Path(s"$t2/dv")).length == 1)
  }

  test("mergeVectored: a tombstoned-only key counts as NOT matched") {
    val t = fresh("mv_dead")
    quartiles(t)
    TxLog.deleteVectored(spark, t, "id", Some(13L), Some(13L))
    // update-only merge (no inserts): key 13 is dead, so nothing matches
    TxLog.mergeVectored(spark, t, Seq((13L, "GHOST")).toDF("id", "s"), "id",
      insertNotMatched = false)
    assert(!rows(TxLog.read(spark, t)).exists(_._2 == "GHOST"))
    // with inserts allowed the dead key INSERTS (it matched nothing)
    TxLog.mergeVectored(spark, t, Seq((13L, "BACK")).toDF("id", "s"), "id")
    assert(rows(TxLog.read(spark, t)).count(_._1 == 13L) == 1)
    assert(rows(TxLog.read(spark, t)).exists(_._2 == "BACK"))
  }

  test("mergeVectored delete mode + null semantics") {
    val t = fresh("mv_del")
    TxLog.commit(spark, t,
      Seq((Some(1L), "a"), (None, "n"), (Some(2L), "b")).toDF("id", "s"))
    TxLog.mergeVectored(spark, t,
      Seq((Some(1L), "x"), (None.asInstanceOf[Option[Long]], "srcnull"))
        .toDF("id", "s"),
      "id", whenMatched = "delete")
    val got = TxLog.read(spark, t).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(1))).sorted
    // matched 1 deleted; null target row survives; null source inserts
    assert(got.toSeq == Seq((-1L, "n"), (-1L, "srcnull"), (2L, "b")))
  }

  test("mergeVectored then purge: metadata paths return, values intact") {
    val t = fresh("mv_purge")
    quartiles(t)
    TxLog.mergeVectored(spark, t, Seq((13L, "UPD")).toDF("id", "s"), "id")
    assert(TxLog.statsAgg(spark, t, Seq("id")).isEmpty)
    TxLog.purgeDeletes(spark, t)
    assert(TxLog.statsAgg(spark, t, Seq("id")).isDefined)
    val got = rows(TxLog.read(spark, t))
    assert(got.size == 40 && got.count(_._2 == "UPD") == 1)
  }

  test("mergeVectored rejects duplicate source keys") {
    val t = fresh("mv_dup")
    quartiles(t)
    intercept[IllegalArgumentException] {
      TxLog.mergeVectored(spark, t,
        Seq((13L, "a"), (13L, "b")).toDF("id", "s"), "id")
    }
  }

  test("compact through read() materializes vectors") {
    val t = fresh("compact")
    quartiles(t)
    TxLog.deleteVectored(spark, t, "id", Some(13L), Some(16L))
    val v = TxLog.compact(spark, t)
    assert(rows(TxLog.read(spark, t, Some(v))).size == 36)
    assert(TxLog.statsAgg(spark, t, Seq("id")).isDefined) // vector-free again
  }

  test("txlog stream fails loudly on an in-place line change") {
    val t = fresh("stream")
    quartiles(t)
    val src = new graft.sources.TxLogSource(spark, t,
      TxLog.read(spark, t).schema, ignoreChanges = false)
    TxLog.deleteVectored(spark, t, "id", Some(13L), Some(16L))
    val e = intercept[IllegalStateException] {
      src.getBatch(
        Some(org.apache.spark.sql.execution.streaming.runtime.LongOffset(4L)),
        org.apache.spark.sql.execution.streaming.runtime.LongOffset(5L))
    }
    assert(e.getMessage.contains("deletion"))
  }

  test("streaming a vectored table's initial snapshot yields LIVE rows") {
    val t = fresh("stream_init")
    val cp = fresh("stream_init_cp")
    quartiles(t)
    TxLog.deleteVectored(spark, t, "id", Some(13L), Some(16L))
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("txlog").load(t)
      .select($"id").writeStream
      .option("checkpointLocation", cp)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = b.as[Long].collect().toSeq
        got.synchronized { got ++= ids }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(got.sorted.toSeq ==
      (0L until 40L).filterNot(k => k >= 13L && k <= 16L))
  }

  test("autoPurge acts only past the byte-fraction threshold (FIXTURES §F policy)") {
    val t = fresh("autopurge")
    quartiles(t)
    // tombstone ONE of four equal batches: dv-carrying fraction ≈ ¼ of
    // scan bytes — at (or under) the documented threshold ⇒ no-op
    TxLog.deleteVectored(spark, t, "id", Some(13L), Some(16L))
    assert(TxLog.autoPurge(spark, t, maxDvFraction = 0.30).isEmpty,
      "below/at threshold must be a metadata-only no-op")
    // still vectored: metadata fast paths stay declined
    assert(TxLog.statsAgg(spark, t, Seq("id")).isEmpty)
    val vBefore = TxLog.latestVersion(spark, t)
    // a second batch's delete pushes the carrying fraction to ~½ ⇒ acts
    TxLog.deleteVectored(spark, t, "id", Some(23L), Some(26L))
    val purged = TxLog.autoPurge(spark, t, maxDvFraction = 0.30)
    assert(purged.exists(_ > vBefore), "past threshold must purge")
    // metadata fast paths light up after, values intact
    assert(TxLog.statsAgg(spark, t, Seq("id")).isDefined)
    assert(rows(TxLog.read(spark, t)).map(_._1) ==
      (0L until 40L).filterNot(k => (k >= 13L && k <= 16L) || (k >= 23L && k <= 26L)))
    // vector-free table: always a no-op
    assert(TxLog.autoPurge(spark, t, maxDvFraction = 0.0).isEmpty)
  }

  test("autoPurge legacy self-heal is gated on an actionable policy (r9 ADVICE)") {
    val t = fresh("autopurge_legacy")
    // a stats-less (legacy) batch that then receives a deletion vector:
    // its dv row fraction is unmeasurable from the manifest
    TxLog.commit(spark, t,
      (0L until 10L).map(k => (k, s"s$k")).toDF("id", "s"),
      collectStats = false)
    TxLog.commit(spark, t,
      (10L until 20L).map(k => (k, s"s$k")).toDF("id", "s"), append = true)
    TxLog.deleteVectored(spark, t, "id", Some(1L), Some(2L))
    val v = TxLog.latestVersion(spark, t)
    // maxDvFraction == 1.0 says "never purge": an unmeasurable fraction
    // changes nothing, so the one-time heal rewrite must NOT fire
    assert(TxLog.autoPurge(spark, t, maxDvFraction = 1.0).isEmpty,
      "lenient probe on a legacy manifest must stay metadata-only")
    assert(TxLog.latestVersion(spark, t) == v)
    // an actionable policy heals once (re-commits measurable stats)...
    assert(TxLog.autoPurge(spark, t, maxDvFraction = 0.99).isDefined)
    // ...after which the table is vector-free and probes no-op
    assert(TxLog.autoPurge(spark, t, maxDvFraction = 0.99).isEmpty)
    assert(rows(TxLog.read(spark, t)).map(_._1) ==
      (0L until 20L).filterNot(k => k == 1L || k == 2L))
  }

  test("txlog batch format refuses a vectored snapshot with a clear error") {
    val t = fresh("fmt")
    quartiles(t)
    assert(spark.read.format("txlog").load(t).count() == 40L)
    TxLog.deleteVectored(spark, t, "id", Some(13L), Some(16L))
    val e = intercept[IllegalStateException] {
      spark.read.format("txlog").load(t).count()
    }
    assert(e.getMessage.contains("purgeDeletes"))
    // time travel to the pre-delete version still works through the format
    assert(spark.read.format("txlog").option("versionAsOf", "4")
      .load(t).count() == 40L)
  }
}
