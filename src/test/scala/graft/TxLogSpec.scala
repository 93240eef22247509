package graft

import graft.sources.TxLog
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

class TxLogSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def fresh(name: String): String = {
    val dir = s"${GraftSession.scratchBase}/txlog_spec_$name"
    fs.delete(new Path(dir), true)
    dir
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, String)].collect().sortBy(_._1).toSeq

  test("commit/read roundtrip; overwrite replaces; append accumulates") {
    val t = fresh("rt")
    assert(TxLog.commit(spark, t, Seq((1L, "a")).toDF("id", "s")) == 1L)
    assert(rows(TxLog.read(spark, t)) == Seq((1L, "a")))
    assert(TxLog.commit(spark, t, Seq((2L, "b")).toDF("id", "s")) == 2L)
    assert(rows(TxLog.read(spark, t)) == Seq((2L, "b"))) // overwrite semantics
    assert(TxLog.commit(spark, t, Seq((3L, "c")).toDF("id", "s"), append = true) == 3L)
    assert(rows(TxLog.read(spark, t)) == Seq((2L, "b"), (3L, "c")))
  }

  test("time travel: every historical snapshot stays readable and exact") {
    val t = fresh("tt")
    TxLog.commit(spark, t, Seq((1L, "a")).toDF("id", "s"))
    TxLog.commit(spark, t, Seq((2L, "b")).toDF("id", "s"))
    TxLog.commit(spark, t, Seq((4L, "d")).toDF("id", "s"), append = true)
    assert(rows(TxLog.read(spark, t, Some(1L))) == Seq((1L, "a")))
    assert(rows(TxLog.read(spark, t, Some(2L))) == Seq((2L, "b")))
    assert(rows(TxLog.read(spark, t, Some(3L))) == Seq((2L, "b"), (4L, "d")))
  }

  test("a lost commit race retries onto the winner's log (serialized versions)") {
    val t = fresh("race")
    TxLog.commit(spark, t, Seq((1L, "a")).toDF("id", "s"))
    // simulate a racing winner: v2 appears between the loser's version
    // read and its create-exclusive
    fs.create(new Path(s"$t/_log/v2"), false).close()
    val v = TxLog.commit(spark, t, Seq((9L, "z")).toDF("id", "s"))
    assert(v == 3L, s"loser must land at v3, got v$v")
    assert(rows(TxLog.read(spark, t, Some(3L))) == Seq((9L, "z")))
  }

  // ------------------------------------------------------------------
  // Round-5 asks: the commit protocol's object-store claims, exercised
  // on a real NON-default FS scheme (chaos:// = RawLocal + copy-delete
  // rename + injectable manifest-write faults).
  // ------------------------------------------------------------------

  private def chaosDir(name: String): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.chaos.impl", classOf[ChaosFileSystem].getName)
    val local = s"${GraftSession.scratchBase}/txlog_chaos_$name"
    fs.delete(new Path(local), true)
    s"chaos://$local"
  }

  test("chaos FS: commit/read/time-travel work on a non-default scheme") {
    val t = chaosDir("rt")
    assert(TxLog.commit(spark, t, Seq((1L, "a")).toDF("id", "s")) == 1L)
    assert(TxLog.commit(spark, t, Seq((2L, "b")).toDF("id", "s"), append = true) == 2L)
    assert(rows(TxLog.read(spark, t)) == Seq((1L, "a"), (2L, "b")))
    assert(rows(TxLog.read(spark, t, Some(1L))) == Seq((1L, "a")))
  }

  test("chaos FS: a lost race still serializes versions (create-exclusive holds)") {
    val t = chaosDir("race")
    TxLog.commit(spark, t, Seq((1L, "a")).toDF("id", "s"))
    val cfs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    cfs.create(new Path(s"$t/_log/v2"), false).close()
    val v = TxLog.commit(spark, t, Seq((9L, "z")).toDF("id", "s"))
    assert(v == 3L, s"loser must land at v3, got v$v")
    assert(rows(TxLog.read(spark, t, Some(3L))) == Seq((9L, "z")))
  }

  test("chaos FS: a manifest write that dies mid-stream never becomes the committed version") {
    val t = chaosDir("fault")
    TxLog.commit(spark, t, Seq((1L, "a")).toDF("id", "s"))
    ChaosFileSystem.failNextManifestWrite.set(true)
    val e = intercept[java.io.IOException] {
      TxLog.commit(spark, t, Seq((2L, "b")).toDF("id", "s"))
    }
    assert(e.getMessage.contains("chaos"))
    // the claimed v2 file must be GONE — not a truncated committed manifest
    assert(TxLog.latestVersion(spark, t) == 1L,
      "truncated manifest survived as the latest version")
    assert(rows(TxLog.read(spark, t)) == Seq((1L, "a"))) // readers unharmed
    // and the next commit proceeds cleanly onto v2
    assert(TxLog.commit(spark, t, Seq((3L, "c")).toDF("id", "s")) == 2L)
    assert(rows(TxLog.read(spark, t)) == Seq((3L, "c")))
  }

  // ------------------------------------------------------------------
  // Manifest-level file skipping (footer-harvested min/max stats).
  // ------------------------------------------------------------------

  test("readWhere prunes batches outside the range and stays exact") {
    val t = fresh("stats")
    // four appended batches with disjoint id ranges
    Seq(0L, 100L, 200L, 300L).foreach { base =>
      TxLog.commit(spark, t,
        (base until base + 100L).map(i => (i, s"v$i")).toDF("id", "s"),
        append = true)
    }
    val m = TxLog.manifest(spark, t)
    assert(m.size == 4)
    assert(m.forall(_._2.contains("id")), s"id stats missing: $m")
    assert(m.forall(_._2("id").kind == "l"))
    assert(m.forall(_._2.contains("s")), "string stats missing")

    val hit = TxLog.readWhere(spark, t, "id", Some(150L), Some(170L))
    // planning-time skipping: only the [100,199] batch's files are read
    val touchedDirs = hit.inputFiles.map(f =>
      new Path(f).getParent.getName).toSet
    assert(touchedDirs.size == 1,
      s"expected exactly one batch dir touched, got $touchedDirs")
    assert(hit.count() == 21)
    // exactness vs the unpruned scan
    val full = TxLog.read(spark, t)
      .filter($"id" >= 150L && $"id" <= 170L)
    assert(hit.as[(Long, String)].collect().sorted.toSeq ==
      full.as[(Long, String)].collect().sorted.toSeq)
  }

  test("readWhere prunes on string bounds and keeps stats-less batches") {
    val t = fresh("statsstr")
    TxLog.commit(spark, t,
      Seq((1L, "apple"), (2L, "banana")).toDF("id", "s"), append = true)
    TxLog.commit(spark, t,
      Seq((3L, "melon"), (4L, "peach")).toDF("id", "s"), append = true)
    // a legacy batch committed without stats must survive any prune
    TxLog.commit(spark, t,
      Seq((5L, "zebra")).toDF("id", "s"), append = true, collectStats = false)
    val m = TxLog.manifest(spark, t)
    assert(m.count(_._2.isEmpty) == 1, "stats-less batch lost its legacy form")
    val got = TxLog.readWhere(spark, t, "s", Some("m"), Some("q"))
      .as[(Long, String)].collect().sorted.toSeq
    assert(got == Seq((3L, "melon"), (4L, "peach")))
    val dirs = TxLog.readWhere(spark, t, "s", Some("m"), Some("q"))
      .inputFiles.map(f => new Path(f).getParent.getName).toSet
    assert(dirs.size == 2, // melon/peach batch + conservatively-kept legacy batch
      s"expected pruned batch 1 only, keeping legacy: $dirs")
  }

  test("readWhere with every batch pruned returns empty with the table schema") {
    val t = fresh("statsempty")
    TxLog.commit(spark, t, Seq((1L, "a")).toDF("id", "s"))
    val none = TxLog.readWhere(spark, t, "id", Some(500L), None)
    assert(none.columns.toSeq == Seq("id", "s"))
    assert(none.count() == 0)
  }

  test("stats survive the append carry-forward and time travel") {
    val t = fresh("statscarry")
    TxLog.commit(spark, t, Seq((1L, "a")).toDF("id", "s"), append = true)
    TxLog.commit(spark, t, Seq((100L, "b")).toDF("id", "s"), append = true)
    // v2's manifest carries v1's line VERBATIM — including its stats
    val m2 = TxLog.manifest(spark, t, Some(2L))
    assert(m2.size == 2 && m2.forall(_._2.contains("id")))
    val pruned = TxLog.readWhere(spark, t, "id", None, Some(10L))
    assert(pruned.inputFiles.map(f => new Path(f).getParent.getName).toSet.size == 1)
    assert(pruned.as[(Long, String)].collect().toSeq == Seq((1L, "a")))
  }

  test("readWhere string bounds order as UTF-8 bytes, not UTF-16 code units") {
    val t = fresh("statsutf8")
    // batch A holds only a supplementary-plane string (🎉 = U+1F389,
    // UTF-16 surrogate units 0xD83C.. < 0xE000 but UTF-8 bytes F0 9F..
    // > EE 80..): under Java String order the batch max sorts BELOW the
    // probe's lower bound and the batch would be wrongly pruned —
    // silent row loss. Parquet footer order and Spark's UTF8String
    // filter both say it matches.
    TxLog.commit(spark, t, Seq((1L, "🎉x")).toDF("id", "s"), append = true)
    TxLog.commit(spark, t, Seq((2L, "aa")).toDF("id", "s"), append = true)
    val got = TxLog.readWhere(spark, t, "s", Some(""), None)
    assert(got.as[(Long, String)].collect().toSeq == Seq((1L, "🎉x")),
      "astral-plane row lost to a UTF-16-ordered prune")
    // and the non-matching batch is actually skipped at the manifest
    assert(got.inputFiles.map(f => new Path(f).getParent.getName).toSet.size == 1)
  }

  test("readWhere rescales decimal-annotated int stats to user units") {
    val t = fresh("statsdec")
    def batch(vals: Seq[(Long, String)]) = TxLog.commit(spark, t,
      vals.toDF("id", "amt")
        .select($"id", $"amt".cast("decimal(9,2)").as("amt")), append = true)
    // decimal(9,2) stores as annotated INT32 with UNSCALED stats
    // (500.00 -> 50000): compared raw against the user-unit bound 600,
    // batch A's min 50000 > 600 reads as disjoint and the 500.00-600.00
    // rows silently vanish
    batch(Seq((1L, "500.00"), (2L, "600.00"), (3L, "700.00"))) // A
    batch(Seq((4L, "100.00"), (5L, "200.00")))                 // B
    val m = TxLog.manifest(spark, t)
    assert(m.forall(_._2.get("amt").exists(_.kind == "d")), s"amt stats: $m")
    val got = TxLog.readWhere(spark, t, "amt", None, Some(BigDecimal("600.00")))
    assert(got.select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 4L, 5L))
    // prune still real: a probe hitting only batch B touches one dir
    val bOnly = TxLog.readWhere(spark, t, "amt", None, Some(BigDecimal("300.00")))
    assert(bOnly.inputFiles.map(f => new Path(f).getParent.getName).toSet.size == 1)
  }

  test("readWhere decodes date-annotated int stats and prunes on ISO bounds") {
    val t = fresh("statsdate")
    def d(s: String) = java.sql.Date.valueOf(s)
    TxLog.commit(spark, t,
      Seq((1L, d("2023-01-10")), (2L, d("2023-06-01"))).toDF("id", "day"),
      append = true)
    TxLog.commit(spark, t,
      Seq((3L, d("2024-03-05")), (4L, d("2024-11-20"))).toDF("id", "day"),
      append = true)
    val m = TxLog.manifest(spark, t)
    assert(m.forall(_._2.get("day").exists(_.kind == "s")), s"day stats: $m")
    val got = TxLog.readWhere(spark, t, "day", Some(d("2024-01-01")), None)
    assert(got.select($"id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
    assert(got.inputFiles.map(f => new Path(f).getParent.getName).toSet.size == 1,
      "2023 batch must be skipped at the manifest")
  }

  test("readWhereAll ANDs per-column ranges at the manifest (partition-key + id probe)") {
    val t = fresh("statsmulti")
    // 2x2 grid of (part, id-range) batches: only ('a', [0,9]) survives
    // a probe bounded on BOTH columns; either column alone keeps two
    for (p <- Seq("a", "b"); base <- Seq(0L, 100L))
      TxLog.commit(spark, t,
        (base until base + 10L).map(i => (i, p)).toDF("id", "part"),
        append = true)
    val hit = TxLog.readWhereAll(spark, t, Map(
      "part" -> (Some("a"), Some("a")),
      "id" -> (Some(0L), Some(9L))))
    assert(hit.inputFiles.map(f => new Path(f).getParent.getName).toSet.size == 1,
      "both dimensions must prune together")
    assert(hit.count() == 10)
    val oneCol = TxLog.readWhere(spark, t, "id", Some(0L), Some(9L))
    assert(oneCol.inputFiles.map(f => new Path(f).getParent.getName).toSet.size == 2)
    // exactness vs the unpruned scan
    val full = TxLog.read(spark, t).filter($"part" === "a" && $"id" <= 9L)
    assert(hit.as[(Long, String)].collect().sorted.toSeq ==
      full.as[(Long, String)].collect().sorted.toSeq)
  }

  test("readWhere mergeSchema: pruning never changes the result schema") {
    val t = fresh("statsevolve")
    TxLog.commit(spark, t, Seq((1L, "a")).toDF("id", "s"), append = true)
    TxLog.commit(spark, t,
      Seq((100L, "b", 7L)).toDF("id", "s", "extra"), append = true)
    // probe hits only the OLD batch; the evolved column must still be in
    // the schema (null-filled), exactly as in the unpruned merged read
    val hit = TxLog.readWhere(spark, t, "id", None, Some(10L), mergeSchema = true)
    assert(hit.columns.sorted.toSeq == Seq("extra", "id", "s"))
    assert(hit.inputFiles.map(f => new Path(f).getParent.getName).toSet.size == 1)
    assert(hit.select($"id", $"extra").as[(Long, Option[Long])].collect().toSeq ==
      Seq((1L, None)))
    // all-pruned fallback: still the union schema, zero rows
    val none = TxLog.readWhere(spark, t, "id", Some(999L), None, mergeSchema = true)
    assert(none.columns.sorted.toSeq == Seq("extra", "id", "s"))
    assert(none.count() == 0)
    // without mergeSchema the fallback is the LATEST batch's schema —
    // deterministic, not whichever file Spark lists first
    val none2 = TxLog.readWhere(spark, t, "id", Some(999L), None)
    assert(none2.columns.toSeq == Seq("id", "s", "extra"))
    assert(none2.count() == 0)
  }

  test("manifest blooms: point probes on a hash key skip batches min/max cannot") {
    val t = fresh("bloom")
    val tNo = fresh("bloomless")
    def md5str(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // 4 batches keyed by a HASH: every batch spans ~the full [0-f] range,
    // so min/max stats overlap every probe and never prune
    val batches = (0 until 4).map { b =>
      (0 until 200).map(i => (md5str(s"k-$b-$i"), b.toLong, i.toLong))
    }
    batches.foreach { rows =>
      TxLog.commit(spark, t, rows.toDF("h", "batch", "i"),
        append = true, collectBlooms = Seq("h" -> 300L))
      TxLog.commit(spark, tNo, rows.toDF("h", "batch", "i"), append = true)
    }
    val probe = md5str("k-2-77") // lives only in batch 2
    // stats-only table: ranges overlap, every batch read
    val noBloomDirs = TxLog.readWhere(spark, tNo, "h", Some(probe), Some(probe))
      .inputFiles.map(f => new Path(f).getParent.getName).toSet
    assert(noBloomDirs.size == 4, s"fixture broken: ranges should overlap ($noBloomDirs)")
    // bloom table: the three definitely-not batches are skipped at the
    // manifest (3% fpp per batch is deterministic — murmur, fixed seed —
    // so allow at most one stable false positive)
    val hit = TxLog.readWhere(spark, t, "h", Some(probe), Some(probe))
    val bloomDirs = hit.inputFiles.map(f => new Path(f).getParent.getName).toSet
    assert(bloomDirs.size <= 2, s"bloom should skip non-holding batches: $bloomDirs")
    assert(hit.select($"batch", $"i").as[(Long, Long)].collect().toSeq ==
      Seq((2L, 77L)))
    // RANGE probes ignore blooms (a range can match keys never inserted)
    val range = TxLog.readWhere(spark, t, "h", Some("0"), Some("g"))
    assert(range.count() == 800L)
    // absent key: every batch bloom says no -> latest-batch schema fallback, zero rows
    assert(TxLog.readWhere(spark, t, "h",
      Some(md5str("never")), Some(md5str("never"))).count() == 0L)
  }

  test("compactClustered: z-contiguous batches let EVERY dimension prune at the manifest") {
    val t = fresh("zopt")
    val grid = (0 until 128).flatMap(x => (0 until 128).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    // committed in x-stripes: y stats span [0,127] in every batch — a
    // y-band readWhere reads the whole table
    (0 until 4).foreach { s4 =>
      TxLog.commit(spark, t,
        grid.filter($"x" >= s4 * 32L && $"x" < (s4 + 1) * 32L), append = true)
    }
    def dirsFor(df: org.apache.spark.sql.DataFrame): Int =
      df.inputFiles.map(f => new Path(f).getParent.getName).toSet.size
    val yBand = TxLog.readWhereAll(spark, t,
      Map("y" -> (Some(8L), Some(23L))))
    assert(dirsFor(yBand) == 4, "x-striped layout cannot prune y")
    val v = TxLog.compactClustered(spark, t, Seq("x", "y"), bits = 7, batches = 8)
    assert(v == 5L)
    val m = TxLog.manifest(spark, t)
    assert(m.size >= 6, s"expected ~8 z batches, got ${m.size}")
    assert(m.forall(e => e._2.contains("x") && e._2.contains("y")))
    // now BOTH dimensions prune at the manifest level
    // +1 slack on both bands: repartitionByRange SAMPLES its split
    // points (seeded by the global RDD id, so suite ordering moves
    // them), and one batch can straddle a z-box boundary
    val yAfter = TxLog.readWhereAll(spark, t, Map("y" -> (Some(8L), Some(23L))))
    assert(dirsFor(yAfter) <= m.size / 2 + 1,
      s"y band should skip z batches: ${dirsFor(yAfter)} of ${m.size}")
    // +1: the range partitioner samples its split points, so one batch
    // can straddle a box boundary
    val xAfter = TxLog.readWhereAll(spark, t, Map("x" -> (Some(8L), Some(23L))))
    assert(dirsFor(xAfter) <= m.size / 2 + 1,
      s"x band should skip z batches: ${dirsFor(xAfter)} of ${m.size}")
    val box = TxLog.readWhereAll(spark, t,
      Map("x" -> (Some(8L), Some(23L)), "y" -> (Some(8L), Some(23L))))
    assert(dirsFor(box) <= 2, s"2-d box should touch ~1 batch: ${dirsFor(box)}")
    // values survive the rewrite exactly; old snapshot intact
    assert(box.count() == 16L * 16L)
    assert(TxLog.read(spark, t).count() == 128L * 128L)
    assert(TxLog.read(spark, t, Some(4L)).count() == 128L * 128L)
  }

  test("deleteWhere rewrites only overlapping batches; the rest carry verbatim") {
    val t = fresh("delw")
    Seq(0L, 100L, 200L, 300L).foreach { base =>
      TxLog.commit(spark, t,
        (base until base + 100L).map(i => (i, s"v$i")).toDF("id", "s"),
        append = true)
    }
    val before = TxLog.manifest(spark, t).map(_._1)
    val v = TxLog.deleteWhere(spark, t, "id", Some(150L), Some(170L))
    assert(v == 5L)
    val after = TxLog.manifest(spark, t).map(_._1)
    // three untouched batch dirs carried verbatim, one rewritten dir
    assert(after.size == 4)
    assert(before.toSet.intersect(after.toSet).size == 3,
      s"untouched batches must carry: before=$before after=$after")
    assert(!after.contains(before(1)), "the [100,199] batch must be rewritten")
    // values: exactly the range is gone
    assert(TxLog.read(spark, t).count() == 400L - 21L)
    assert(TxLog.read(spark, t).filter($"id" >= 150L && $"id" <= 170L).count() == 0)
    // the rewritten batch regains stats (future reads/deletes skip it)
    assert(TxLog.manifest(spark, t).forall(_._2.contains("id")))
    // time travel: the pre-delete snapshot still serves all rows
    assert(TxLog.read(spark, t, Some(4L)).count() == 400L)
    // a range no batch can hold is a version-preserving no-op
    assert(TxLog.deleteWhere(spark, t, "id", Some(5000L), Some(6000L)) == 5L)
  }

  test("commitStreaming: replays are exactly-once; orphan data dirs heal") {
    val t = fresh("sink1x")
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val b1 = Seq((3L, "c")).toDF("id", "s")
    assert(TxLog.commitStreaming(spark, t, b0, "q", 0L).contains(1L))
    assert(TxLog.commitStreaming(spark, t, b1, "q", 1L).contains(2L))
    // checkpoint replay of batch 0 after a restart: must be a no-op,
    // even though the caller re-presents the data
    assert(TxLog.commitStreaming(spark, t, b0, "q", 0L).isEmpty)
    assert(rows(TxLog.read(spark, t)) == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // crash between data write and manifest commit: the orphan dir is
    // overwritten by the retry and the batch commits exactly once
    Seq((99L, "partial")).toDF("id", "s")
      .write.parquet(s"$t/data/stream-q-2")
    assert(TxLog.commitStreaming(spark, t,
      Seq((4L, "d"), (5L, "e")).toDF("id", "s"), "q", 2L).contains(3L))
    val got = rows(TxLog.read(spark, t))
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")),
      s"orphan rows leaked or batch lost: $got")
    // a different query id is an independent stream: its batch 1 commits
    assert(TxLog.commitStreaming(spark, t, b1, "other", 1L).contains(4L))
  }

  test("restore re-publishes an old snapshot as the new head, data untouched") {
    val t = fresh("restore")
    TxLog.commit(spark, t, Seq((1L, "a")).toDF("id", "s"))
    TxLog.commit(spark, t, Seq((2L, "b")).toDF("id", "s"), append = true)
    TxLog.commit(spark, t, Seq((9L, "oops")).toDF("id", "s")) // bad overwrite
    assert(rows(TxLog.read(spark, t)) == Seq((9L, "oops")))
    val v = TxLog.restore(spark, t, 2L)
    assert(v == 4L)
    assert(rows(TxLog.read(spark, t)) == Seq((1L, "a"), (2L, "b")))
    // history preserved: the bad version stays readable
    assert(rows(TxLog.read(spark, t, Some(3L))) == Seq((9L, "oops")))
    // restored head re-references the old dirs: stats carried verbatim
    assert(TxLog.manifest(spark, t, Some(4L)) == TxLog.manifest(spark, t, Some(2L)))
    // vacuum keeping only the restored head keeps its (old) dirs alive
    TxLog.vacuum(spark, t, 4L)
    assert(rows(TxLog.read(spark, t)) == Seq((1L, "a"), (2L, "b")))
  }

  test("deleteWhere point deletes skip batches via the committed bloom") {
    val t = fresh("delbloom")
    def md5str(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val batches = (0 until 4).map { b =>
      (0 until 200).map(i => (md5str(s"k-$b-$i"), b.toLong, i.toLong))
    }
    batches.foreach { rows =>
      TxLog.commit(spark, t, rows.toDF("h", "batch", "i"),
        append = true, collectBlooms = Seq("h" -> 300L))
    }
    val before = TxLog.manifest(spark, t).map(_._1)
    TxLog.deleteWhere(spark, t, "h",
      Some(md5str("k-2-77")), Some(md5str("k-2-77")))
    val after = TxLog.manifest(spark, t).map(_._1)
    // min/max overlap on every batch (hash key), so only the bloom can
    // confine the rewrite; allow one stable false positive
    assert(before.toSet.intersect(after.toSet).size >= 2,
      s"bloom should keep non-holding batches unrewritten: $before -> $after")
    assert(TxLog.read(spark, t).count() == 799L)
    assert(TxLog.read(spark, t).filter($"batch" === 2L && $"i" === 77L).count() == 0)
  }

  test("deleteWhere: NULL keys survive a range delete (SQL match-only semantics)") {
    val t = fresh("delwnull")
    TxLog.commit(spark, t,
      Seq((Option(1L), "a"), (Option(2L), "b"), (Option.empty[Long], "c"))
        .toDF("id", "s"))
    TxLog.deleteWhere(spark, t, "id", Some(2L), Some(9L))
    val got = TxLog.read(spark, t).select($"s").as[String].collect().sorted.toSeq
    assert(got == Seq("a", "c"), s"null-key row must survive: $got")
  }

  test("streamingMvMaintain: base and view stay version-aligned; every cut consistent") {
    val s = spark
    import org.apache.spark.sql.functions._
    val root = fresh("smv")
    val docs = Tables.documents(s, sf0001)
    val changes = docs.filter(col("doc_id") % 10 === 1)
      .select(col("doc_id"), upper(col("text")).as("text"), col("lang"),
        col("source"), col("n_chars"), lit("U").as("op"), lit(1).as("seq"))
    val del = docs.filter(col("doc_id") % 10 === 2)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"), lit("D").as("op"), lit(2).as("seq"))
    changes.repartition(1).write.parquet(s"$root/t1")
    del.repartition(1).write.parquet(s"$root/t2")
    fs.mkdirs(new Path(s"$root/in"))
    val t0 = System.currentTimeMillis() - 4000L
    Seq(("t1", "b0.parquet"), ("t2", "b1.parquet")).zipWithIndex.foreach {
      case ((t, n), i) =>
        val dst = new Path(s"$root/in/$n")
        fs.rename(fs.globStatus(new Path(s"$root/$t/part-*.parquet")).head.getPath, dst)
        fs.setTimes(dst, t0 + i * 2000L, -1) // FileStreamSource orders by mtime
    }
    val finalMv = graft.streaming.StreamingOps.streamingMvMaintain(
      s, s"$root/in", docs, s"$root/t", "doc_id", "source", "n_chars")
    // three versions on both tables: initial + one per micro-batch
    assert(TxLog.latestVersion(s, s"$root/t/base") == 3L)
    assert(TxLog.latestVersion(s, s"$root/t/mv") == 3L)
    // EVERY historical cut is consistent: rollup(base vN) == mv vN
    (1L to 3L).foreach { v =>
      val fromBase = TxLog.read(s, s"$root/t/base", Some(v))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("total"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val mv = TxLog.read(s, s"$root/t/mv", Some(v))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(mv == fromBase, s"cut v$v inconsistent")
    }
    assert(finalMv.count() > 0)
  }

  test("CHECK invariant: violating commits are rejected with zero trace; NULL passes") {
    val t = fresh("check")
    import org.apache.spark.sql.functions.col
    val ok = Seq((1L, Some(10L)), (2L, None)).toDF("id", "v") // null v PASSES
    TxLog.commit(spark, t, ok, append = true, check = Some(col("v") >= 0L))
    assert(TxLog.read(spark, t).count() == 2L)
    val v1 = TxLog.latestVersion(spark, t)
    val dataDirs = fs.listStatus(new Path(s"$t/data")).length
    intercept[IllegalArgumentException] {
      TxLog.commit(spark, t, Seq((3L, Some(-5L))).toDF("id", "v"),
        append = true, check = Some(col("v") >= 0L))
    }
    // rejection is atomic-by-construction: no version, no orphan dir
    assert(TxLog.latestVersion(spark, t) == v1)
    assert(fs.listStatus(new Path(s"$t/data")).length == dataDirs)
  }

  test("append-time type guard: conflicts rejected, additive evolution allowed") {
    val t = fresh("typeguard")
    TxLog.commit(spark, t, Seq((1L, "a")).toDF("id", "s"), append = true)
    // additive: a NEW column is fine
    TxLog.commit(spark, t, Seq((2L, "b", 1.5)).toDF("id", "s", "d"), append = true)
    // conflict: same name, different type — must fail the WRITE
    val ex = intercept[IllegalArgumentException] {
      TxLog.commit(spark, t, Seq((3L, 99L)).toDF("id", "s"), append = true)
    }
    assert(ex.getMessage.contains("type conflict"))
    // overwrite (non-append) replaces the snapshot: any schema goes
    TxLog.commit(spark, t, Seq((3L, 99L)).toDF("id", "s"), append = false)
    assert(TxLog.read(spark, t).count() == 1L)
  }

  test("autoCluster: acts only when the manifest says the layout degraded") {
    val t = fresh("autocluster")
    (0 until 4).foreach { s4 =>
      TxLog.commit(spark, t, (0L until 100L)
        .map(y => (s4 * 100L + y, y)).toDF("x", "y"), append = true)
    }
    // x is range-split: healthy, no rewrite
    assert(TxLog.autoCluster(spark, t, Seq("x")).isEmpty)
    // y overlaps everywhere: rewrite fires and HEALTH IMPROVES
    def yFrac: Double = {
      val r = TxLog.clusterHealth(spark, t, Seq("y")).collect().head
      r.getLong(2).toDouble / r.getLong(3)
    }
    val before = yFrac
    assert(before == 1.0)
    assert(TxLog.autoCluster(spark, t, Seq("y"), bits = 7).isDefined)
    assert(yFrac < before, "z-order must reduce y overlap")
    assert(TxLog.read(spark, t).count() == 400L, "rewrite preserves rows")
    // an already-healthy layout is left alone at a lenient threshold
    assert(TxLog.autoCluster(spark, t, Seq("y"),
      maxOverlapFraction = 0.99).isEmpty)
  }

  test("vacuum drops only directories no retained manifest references") {
    val t = fresh("vac")
    TxLog.commit(spark, t, Seq((1L, "a")).toDF("id", "s"))
    TxLog.commit(spark, t, Seq((2L, "b")).toDF("id", "s"))
    TxLog.commit(spark, t, Seq((3L, "c")).toDF("id", "s"), append = true)
    val dataDirsBefore = fs.listStatus(new Path(s"$t/data")).length
    assert(dataDirsBefore == 3)
    TxLog.vacuum(spark, t, retainFrom = 2L)
    // v1's directory is referenced by no retained manifest -> gone;
    // v2/v3's two directories survive
    assert(fs.listStatus(new Path(s"$t/data")).length == 2)
    assert(rows(TxLog.read(spark, t, Some(2L))) == Seq((2L, "b")))
    assert(rows(TxLog.read(spark, t, Some(3L))) == Seq((2L, "b"), (3L, "c")))
    intercept[Exception](TxLog.read(spark, t, Some(1L)).collect())
  }

  // ------------------------------------------------------------------
  // MERGE INTO (keyed upsert with two-phase file pruning)
  // ------------------------------------------------------------------

  private def mergeFixture(name: String): String = {
    val t = fresh(name)
    // two disjoint-range batches: [0..99] and [100..199]
    Seq(0L, 100L).foreach { base =>
      TxLog.commit(spark, t,
        (base until base + 100L).map(i => (i, s"v$i")).toDF("id", "s"),
        append = true)
    }
    t
  }

  test("merge upsert: matched rows replaced, unmatched inserted, untouched batch verbatim") {
    val t = mergeFixture("mrg")
    val linesBefore = scala.io.Source.fromInputStream(
      fs.open(new Path(s"$t/_log/v2"))).getLines().toSeq
    val src = Seq((150L, "UP150"), (160L, "UP160"), (500L, "NEW500"))
      .toDF("id", "s")
    val v = TxLog.merge(spark, t, src, "id")
    assert(v == 3L)
    val got = rows(TxLog.read(spark, t))
    assert(got.size == 201)
    assert(got.find(_._1 == 150L).map(_._2).contains("UP150"))
    assert(got.find(_._1 == 160L).map(_._2).contains("UP160"))
    assert(got.find(_._1 == 500L).map(_._2).contains("NEW500"))
    assert(got.find(_._1 == 151L).map(_._2).contains("v151")) // neighbor untouched
    // the [0..99] batch's manifest LINE (stats, schema, all) carries verbatim
    val linesAfter = scala.io.Source.fromInputStream(
      fs.open(new Path(s"$t/_log/v3"))).getLines().toSeq
    assert(linesAfter.contains(linesBefore.head),
      "untouched batch line must carry into the merged version verbatim")
    assert(!linesAfter.contains(linesBefore(1)), "matched batch must be rewritten")
  }

  test("merge whenMatched=delete drops matched keys; insertNotMatched still inserts") {
    val t = mergeFixture("mrgdel")
    val src = Seq((10L, "x"), (20L, "x"), (900L, "NEW900")).toDF("id", "s")
    TxLog.merge(spark, t, src, "id", whenMatched = "delete")
    val got = rows(TxLog.read(spark, t))
    assert(got.size == 199) // 200 - 2 deleted + 1 inserted
    assert(!got.exists(r => r._1 == 10L || r._1 == 20L))
    assert(got.find(_._1 == 900L).map(_._2).contains("NEW900"))
  }

  test("merge update without insert drops unmatched source rows") {
    val t = mergeFixture("mrgnoins")
    val src = Seq((5L, "UP5"), (700L, "ghost")).toDF("id", "s")
    TxLog.merge(spark, t, src, "id", insertNotMatched = false)
    val got = rows(TxLog.read(spark, t))
    assert(got.size == 200)
    assert(got.find(_._1 == 5L).map(_._2).contains("UP5"))
    assert(!got.exists(_._1 == 700L))
  }

  test("merge rejects duplicate source keys (SQL MERGE multi-match error)") {
    val t = mergeFixture("mrgdup")
    val src = Seq((5L, "a"), (5L, "b")).toDF("id", "s")
    intercept[IllegalArgumentException](TxLog.merge(spark, t, src, "id"))
  }

  test("merge: null-keyed target rows always survive; null-keyed source rows insert") {
    val t = fresh("mrgnull")
    TxLog.commit(spark, t,
      Seq((Option(1L), "a"), (Option(2L), "b"), (Option.empty[Long], "nullrow"))
        .toDF("id", "s"))
    val src = Seq((Option(2L), "UP2"), (Option.empty[Long], "nullins"))
      .toDF("id", "s")
    TxLog.merge(spark, t, src, "id")
    val got = TxLog.read(spark, t).as[(Option[Long], String)].collect().toSeq
    assert(got.count(_._1.isEmpty) == 2, s"null-key rows: $got") // survivor + insert
    assert(got.exists(_ == (Option(2L), "UP2")))
    assert(got.exists(_ == (Option(1L), "a")))
    assert(got.size == 4) // survivors (1, null-target) + source (2, null-insert)
  }

  // ------------------------------------------------------------------
  // Metadata-only aggregates (statsAgg)
  // ------------------------------------------------------------------

  test("statsAgg answers count/min/max from the manifest with zero scans") {
    val t = fresh("meta")
    Seq(0L, 100L, 200L).foreach { base =>
      TxLog.commit(spark, t,
        (base until base + 50L).map(i => (i, s"v$i")).toDF("id", "s"),
        append = true)
    }
    val out = TxLog.statsAgg(spark, t, Seq("id", "s")).get
    assert(out.inputFiles.isEmpty, "metadata-only plan must list no files")
    val r = out.collect().head
    assert(r.getAs[Long]("n_rows") == 150L)
    assert(r.getAs[Long]("id_min") == 0L && r.getAs[Long]("id_max") == 249L)
    // string bounds match a real scan's min/max
    val scan = TxLog.read(spark, t).agg(
      org.apache.spark.sql.functions.min($"s"),
      org.apache.spark.sql.functions.max($"s")).head()
    assert(r.getAs[String]("s_min") == scan.getString(0))
    assert(r.getAs[String]("s_max") == scan.getString(1))
  }

  test("statsAgg declines (None) on legacy stats-less batches and all-null columns") {
    val t = fresh("metafall")
    TxLog.commit(spark, t, Seq((1L, "a")).toDF("id", "s"), append = true)
    TxLog.commit(spark, t, Seq((2L, "b")).toDF("id", "s"),
      append = true, collectStats = false)
    assert(TxLog.statsAgg(spark, t, Seq("id")).isEmpty,
      "a batch without a committed row count cannot be answered exactly")
    val t2 = fresh("metanull")
    TxLog.commit(spark, t2,
      Seq((Option(1L), Option("a")), (Option(2L), Option.empty[String]))
        .toDF("id", "s"), append = true)
    TxLog.commit(spark, t2,
      Seq((Option(3L), Option.empty[String])).toDF("id", "s"), append = true)
    // the all-null batch has no footer stats for s -> decline, never fabricate
    assert(TxLog.statsAgg(spark, t2, Seq("s")).isEmpty)
    // but columns with full stats still answer
    val ok = TxLog.statsAgg(spark, t2, Seq("id")).get.collect().head
    assert(ok.getAs[Long]("n_rows") == 3L && ok.getAs[Long]("id_max") == 3L)
  }

  test("statsAgg includeNulls: exact footer null counts, still zero-scan") {
    val t = fresh("metanulls")
    TxLog.commit(spark, t,
      Seq((Option(1L), Option("a")), (Option(2L), Option.empty[String]),
        (Option(3L), Option("c"))).toDF("id", "s"), append = true)
    TxLog.commit(spark, t,
      Seq((Option(4L), Option.empty[String]), (Option(5L), Option("e")))
        .toDF("id", "s"), append = true)
    val out = TxLog.statsAgg(spark, t, Seq("id", "s"), includeNulls = true).get
    assert(out.inputFiles.isEmpty, "null counts must come from the manifest")
    val r = out.collect().head
    assert(r.getAs[Long]("n_rows") == 5L)
    assert(r.getAs[Long]("id_nulls") == 0L)
    assert(r.getAs[Long]("s_nulls") == 2L)
    assert(r.getAs[String]("s_min") == "a" && r.getAs[String]("s_max") == "e")
  }

  test("statsAgg stays exact across merge / deleteWhere rewrites") {
    val t = mergeFixture("metamrg")
    TxLog.merge(spark, t,
      Seq((10L, "UP"), (900L, "NEW")).toDF("id", "s"), "id")
    val r = TxLog.statsAgg(spark, t, Seq("id")).get.collect().head
    assert(r.getAs[Long]("n_rows") == 201L)
    assert(r.getAs[Long]("id_max") == 900L)
    TxLog.deleteWhere(spark, t, "id", Some(0L), Some(49L))
    val r2 = TxLog.statsAgg(spark, t, Seq("id")).get.collect().head
    assert(r2.getAs[Long]("n_rows") == 151L)
    assert(r2.getAs[Long]("id_min") == 50L)
  }

  test("NaN/Infinity probes disable pruning instead of failing planning") {
    val t = fresh("nanprobe")
    TxLog.commit(spark, t,
      Seq((1L, 1.5), (2L, 2.5)).toDF("id", "x"), append = true)
    TxLog.commit(spark, t,
      Seq((3L, 3.5), (4L, Double.NaN)).toDF("id", "x"), append = true)
    // an unorderable bound reaches the stat compare (BigDecimal parse
    // would throw NumberFormatException) -- conservative keep, not a
    // planning crash; the residual filter then answers exactly under
    // Spark's NaN semantics (NaN == NaN, NaN greatest)
    val nan = TxLog.readWhere(spark, t, "x",
      Some(Double.NaN), Some(Double.NaN))
    assert(nan.count() == 1L) // exactly the NaN row
    assert(TxLog.readWhere(spark, t, "x", Some(Double.NaN), None).count() == 1L)
    // point DELETE with a NaN bound: same conservative path, no throw,
    // and it deletes exactly the NaN row
    val v = TxLog.deleteWhere(spark, t, "x",
      Some(Double.NaN), Some(Double.NaN))
    assert(v > 0L)
    assert(TxLog.read(spark, t).count() == 3L)
  }

  test("rewrites preserve additively-evolved columns (no silent drop)") {
    val t = fresh("evorw")
    TxLog.commit(spark, t, Seq((1L, "a")).toDF("id", "s"), append = true)
    // additive evolution: second batch carries an extra column
    TxLog.commit(spark, t,
      Seq((2L, "b", 20L), (3L, "c", 30L)).toDF("id", "s", "extra"),
      append = true)
    // the delete range touches BOTH batches; the rewrite must keep
    // `extra` for rows that had it (plain one-file inference drops it)
    TxLog.deleteWhere(spark, t, "id", Some(1L), Some(2L))
    val back = TxLog.read(spark, t)
    assert(back.columns.contains("extra"))
    val r = back.orderBy("id").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(3L))
    assert(r.head.getAs[Long]("extra") == 30L)
    // merge across the evolved pair keeps the union schema too
    val t2 = fresh("evomrg")
    TxLog.commit(spark, t2, Seq((1L, "a")).toDF("id", "s"), append = true)
    TxLog.commit(spark, t2,
      Seq((2L, "b", 20L)).toDF("id", "s", "extra"), append = true)
    TxLog.merge(spark, t2,
      Seq((1L, "A1", 11L), (2L, "B2", 22L)).toDF("id", "s", "extra"), "id")
    val m = TxLog.read(spark, t2).orderBy("id").collect()
    assert(m.map(_.getAs[Long]("extra")).toSeq == Seq(11L, 22L))
  }
}
