package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Atomic multi-TREE publish for hive-layout sinks — the pipeline's
  * counterpart to [[TxLog.commitMulti]].
  *
  * The reference publishes `times` + `missing_pairs` + `metadata`
  * together per chunk (/root/reference/data/src/utils/times.py:100-107)
  * and its metadata carries pair-count audits
  * (calculate_times.py:96-133) that a crash between the three writes
  * falsifies. [[TxLog.commitMulti]] closes that window for
  * manifest-backed tables; the flagship job, however, publishes
  * HIVE-PARTITIONED TREES ([[TableIO.writePartitioned]] — the
  * reference's own consumer layout), which have no manifest to swing.
  * This class reuses the same 2PC shape with directory renames as the
  * publish primitive:
  *
  *  - STAGE: every tree is written under `txnDir/stage-<id>/<name>` —
  *    invisible to consumers of the final locations. A `txn-<id>.staging`
  *    beacon marks the in-flight job (swept only when BOTH it and the
  *    newest file under the stage dir are stale — a live job writes
  *    continuously).
  *  - INTENT: `txn-<id>.staged` lists (name → finalDir). It is the
  *    transaction's unique CLAIM TOKEN, exactly as in [[TxLog]]:
  *    decide renames it to `.committing`, rollback to `.rolling`; a
  *    rename consumes its source so the two outcomes can never both
  *    win.
  *  - RECORD + CLAIM: `txn-<id>.commit` holds the full decision body
  *    (create-exclusive), then the claim rename. Only a claimed record
  *    publishes.
  *  - PUBLISH (idempotent, per tree): each staged tree carries a
  *    `_GRAFT_TXN` marker file (the txn id; underscore-prefixed, so
  *    Spark/parquet readers ignore it). Publish renames any previous
  *    content aside to `txnDir/old-<id>/<name>-aside-<uuid>` (unique —
  *    Hadoop rename NESTS into an existing directory instead of
  *    failing, so aside targets must never pre-exist), then renames
  *    the staged tree into place — a tree whose marker already equals
  *    the id is recognized as published and never re-published.
  *  - FORGET: delete the set-aside dir, the stage dir, the record, the
  *    marker — in that order, so every crash point re-enters an
  *    idempotent roll-forward.
  *
  * Directory rename is atomic on HDFS and POSIX filesystems; object
  * stores need a rename-capable committer or a manifest-pointer layout
  * ([[TxLog]]) instead — same caveat as every hive-tree publisher.
  *
  * Scale shape: the protocol is metadata-only — O(tables) renames and
  * three tiny txn files; no data pass, no driver loop over rows. The
  * staged writes themselves are the job's normal distributed writes.
  */
object TreeTxn {

  /** What [[recover]] did, by transaction id. */
  case class TreeRecovery(rolledForward: Seq[String], rolledBack: Seq[String])

  val Marker = "_GRAFT_TXN"

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // one atomic-txn-file idiom for the whole sources package: the
  // tmp-infix naming, the sweep filters and the write protocol must
  // never diverge between TxLog and TreeTxn
  private def enc(s: String) = TxLog.enc(s)
  private def dec(s: String) = TxLog.dec(s)
  private def writeAtomic(f: FileSystem, target: Path, txt: String): Unit =
    TxLog.writeTxnFileAtomic(f, target, txt)

  private def body(writes: Seq[(String, String)]): String =
    ("treetxnv1" +: writes.map { case (n, d) => s"${enc(n)}\t${enc(d)}" }
      :+ "end").mkString("\n")

  private def parse(txt: String): Option[Seq[(String, String)]] = {
    val lines = txt.split('\n').toSeq.filter(_.nonEmpty)
    if (!lines.headOption.contains("treetxnv1") ||
        lines.lastOption != Some("end")) None
    else scala.util.Try {
      lines.tail.init.map { l =>
        val a = l.split('\t'); (dec(a(0)), dec(a(1)))
      }
    }.toOption
  }

  private def readFile(f: FileSystem, p: Path): Option[Seq[(String, String)]] =
    try {
      val in = f.open(p)
      val txt = try scala.io.Source.fromInputStream(in).mkString
        finally in.close()
      parse(txt)
    } catch { case _: java.io.FileNotFoundException => None }

  private def markerIdOf(f: FileSystem, treeDir: Path): Option[String] =
    try {
      val in = f.open(new Path(treeDir, Marker))
      Some(try scala.io.Source.fromInputStream(in).mkString.trim
        finally in.close())
    } catch { case _: java.io.FileNotFoundException => None }

  /** Begin a transaction: returns the handle whose [[Handle.staged]]
    * paths the caller writes its trees to, then [[Handle.commit]].
    */
  def begin(spark: SparkSession, txnDir: String,
      writes: Seq[(String, String)]): Handle = {
    require(writes.nonEmpty, "empty transaction")
    require(writes.map(_._1).distinct.size == writes.size,
      "one tree per name per transaction")
    require(writes.forall(w => !w._1.contains("-aside-")),
      "tree names must not contain '-aside-' (reserved for set-asides)")
    require(writes.map(_._2).distinct.size == writes.size,
      "one tree per destination per transaction")
    val f = fs(spark, txnDir)
    f.mkdirs(new Path(txnDir))
    val id = java.util.UUID.randomUUID().toString.take(12)
    // staging beacon BEFORE any tree bytes land: recovery can tell an
    // in-flight job (beacon + fresh writes) from a dead one's litter
    writeAtomic(f, new Path(txnDir, s"txn-$id.staging"), body(writes))
    new Handle(spark, txnDir, id, writes)
  }

  final class Handle private[TreeTxn] (spark: SparkSession, txnDir: String,
      val id: String, writes: Seq[(String, String)]) {

    /** Where to write tree `name` — invisible until commit. */
    def staged(name: String): String = {
      require(writes.exists(_._1 == name), s"unknown tree '$name'")
      s"$txnDir/stage-$id/$name"
    }

    /** Record, claim, publish every tree, forget. `failpoint` is a
      * crash-injection seam for specs (called with `published:<name>`
      * after each tree lands — a throw simulates the coordinator dying
      * between table publishes, the exact window [[recover]] closes).
      */
    def commit(failpoint: String => Unit = _ => ()): Unit = {
      val f = fs(spark, txnDir)
      writes.foreach { case (n, _) =>
        val st = new Path(staged(n))
        require(f.exists(st), s"tree '$n' was never staged at $st")
        // the marker rides INSIDE the tree, so the publish rename
        // carries it and idempotency needs no extra state
        writeAtomic(f, new Path(st, Marker), id)
      }
      val sp = new Path(txnDir, s"txn-$id.staged")
      val cp = new Path(txnDir, s"txn-$id.commit")
      val cm = new Path(txnDir, s"txn-$id.committing")
      writeAtomic(f, sp, body(writes))
      try f.delete(new Path(txnDir, s"txn-$id.staging"), false)
      catch { case _: Throwable => () }
      // RECORD the decision...
      val out = f.create(cp, false)
      try out.write(body(writes).getBytes("UTF-8")) finally out.close()
      failpoint("recorded")
      // ...and CLAIM it: the rename consumes the unique intent, so a
      // racing rollback (stale-intent recovery) and this decide can
      // never both win — same arbitration as TxLog.decideMulti
      if (!TxLog.renameClaim(f, sp, cm) && !f.exists(cm)) {
        // claim gone, no committing marker: either a recovery rolled the
        // stale intent BACK, or it claimed COMMIT on our behalf and
        // already finished (forget erases the marker). Consult the
        // published state before reporting abort — misreporting a
        // committed transaction as rolled back fails the job and skips
        // its post-commit hooks even though every tree is live
        // (same resolution as TxLog.decideMulti)
        val allPublished = writes.forall { case (_, d) =>
          markerIdOf(f, new Path(d)).contains(id) }
        try f.delete(cp, false) catch { case _: Throwable => () }
        if (allPublished) {
          invalidateViews(writes)
          return
        }
        // caveat: trees carry no version history, so a commit that a
        // recovery finished AND a later transaction then overwrote is
        // indistinguishable from a rollback here — the markers are the
        // newer txn's. Acceptable: by then the coordinator has been
        // superseded and its caller must re-derive from live state.
        throw new IllegalStateException(
          s"txn-$id aborted: its intent was claimed and rolled back " +
            "by a concurrent recovery")
      }
      failpoint("claimed")
      publishAll(spark, txnDir, id, writes, failpoint)
    }
  }

  /** Rename `src` onto `dst` expecting `dst` absent. Hadoop rename does
    * NOT fail when the destination is an existing directory — HDFS and
    * RawLocalFileSystem's copy fallback both NEST `src` inside it — so
    * a publish racing another publisher could bury its tree inside the
    * racer's. Detect the nest by the marker (the top of `dst` would
    * carry ours after a clean move) and pull the tree back out; the
    * caller re-probes the outcome.
    */
  private def renameInto(f: FileSystem, src: Path, dst: Path,
      id: String): Unit =
    if (TxLog.renameClaim(f, src, dst) &&
        !markerIdOf(f, dst).contains(id)) {
      val nested = new Path(dst, src.getName)
      if (markerIdOf(f, nested).contains(id))
        TxLog.renameClaim(f, nested, src)
    }

  /** Publish every tree of a CLAIMED transaction, idempotently, then
    * forget the txn files. Shared verbatim by commit and recovery so
    * the two can never disagree about what publishing means.
    */
  private def publishAll(spark: SparkSession, txnDir: String, id: String,
      writes: Seq[(String, String)], failpoint: String => Unit): Unit = {
    val f = fs(spark, txnDir)
    // Two publishers of the SAME claimed transaction can legitimately
    // run concurrently: the coordinator, and a recovery rolling its
    // stalled claim forward (or two recoveries racing each other). Each
    // tree is therefore driven to its published state by a small retry
    // loop of individually safe moves instead of one fragile sequence:
    // set-asides go to UNIQUE names (a rename whose target exists would
    // nest, not fail — see renameInto), publish/restore renames verify
    // the marker afterward and undo an accidental nest, and a captured
    // published tree (a racer's set-aside moved it under old-<id>; the
    // marker travels with it) is restored on the next pass. Residual
    // (documented, leases would be needed to close it): a coordinator
    // wedged PAST the point where a recovery resolved its txn and a
    // newer transaction overwrote the destination would re-publish old
    // content on resume — the job-start recovery ordering (recover
    // before begin) makes that require a wedge spanning two full runs.
    writes.foreach { case (n, finalDir) =>
      val dst = new Path(finalDir)
      val st = new Path(s"$txnDir/stage-$id/$n")
      val oldDir = new Path(s"$txnDir/old-$id")
      def published = markerIdOf(f, dst).contains(id)
      def asideMarked: Option[Path] =
        (try f.listStatus(oldDir).toSeq.map(_.getPath)
         catch { case _: java.io.FileNotFoundException => Nil })
          .filter(p => p.getName == n || p.getName.startsWith(s"$n-aside-"))
          .find(p => markerIdOf(f, p).contains(id))
      var attempts = 0
      while (!published && attempts < 4) {
        attempts += 1
        if (f.exists(st)) {
          if (f.exists(dst)) {
            // set the previous content aside (overwrite semantics — the
            // reference republishes into the same tree) under a unique
            // name; a capture of a racer's freshly published tree is
            // detected by its marker and restored on the next pass
            f.mkdirs(oldDir)
            TxLog.renameClaim(f, dst, new Path(oldDir, s"$n-aside-" +
              java.util.UUID.randomUUID().toString.take(8)))
          } else renameInto(f, st, dst, id)
        } else asideMarked match {
          // staged tree consumed (a racer published it) and the
          // published tree was then captured into old-<id>: restore it
          case Some(entry) if !f.exists(dst) => renameInto(f, entry, dst, id)
          case _ => ()
        }
      }
      if (!published) {
        if (!f.exists(st) && asideMarked.isEmpty)
          throw new IllegalStateException(
            s"txn-$id: staged tree for '$n' is gone and $finalDir does " +
              "not carry its marker — cannot publish; resolve manually")
        throw new java.io.IOException(
          s"txn-$id: could not drive $dst to its published state after " +
            s"$attempts attempts (racing publisher churn) — re-run recovery")
      }
      if (f.exists(st))
        try f.delete(st, true) catch { case _: Throwable => () }
      failpoint(s"published:$n")
    }
    // forget — each step idempotent, any crash point re-enters forward.
    // Deleting old-<id> is the one step that could destroy a published
    // tree a racing set-aside captured there, so verify every final dir
    // still carries the marker FIRST; if any does not, leave the whole
    // txn record in place — the next recover resolves it (an
    // unforgotten published txn only costs a future idempotent replay)
    val allMarked = writes.forall { case (_, d) =>
      markerIdOf(f, new Path(d)).contains(id) }
    if (allMarked) {
      try f.delete(new Path(s"$txnDir/old-$id"), true)
      catch { case _: Throwable => () }
      try f.delete(new Path(s"$txnDir/stage-$id"), true)
      catch { case _: Throwable => () }
      try f.delete(new Path(txnDir, s"txn-$id.commit"), false)
      catch { case _: Throwable => () }
      try f.delete(new Path(txnDir, s"txn-$id.committing"), false)
      catch { case _: Throwable => () }
    }
    // the publish moved NEW content under the final locations —
    // materialized views registered over them must stop serving the
    // pre-publish materialization (the staged writes only ever
    // invalidated their invisible staging paths). This covers the
    // coordinator AND the recovery roll-forward path.
    invalidateViews(writes)
  }

  private def invalidateViews(writes: Seq[(String, String)]): Unit =
    writes.foreach { case (_, d) =>
      try graft.plans.MvCatalog.invalidateByPath(d)
      catch { case _: Throwable => () }
    }

  /** Finish (or erase) every transaction a crashed job left in
    * `txnDir` — run at job start, before trusting the published trees'
    * cross-table invariants (pair conservation needs all three of
    * times/missing_pairs/metadata from the SAME run). Claimed record →
    * roll FORWARD (idempotent publishes). Stale unclaimed intent →
    * claim the abort (rename intent → `.rolling`), then erase the
    * staged trees — final dirs are untouched by a rollback. A stale
    * staging beacon whose stage dir shows no fresh writes is a dead
    * job's litter and is swept.
    */
  def recover(spark: SparkSession, txnDir: String,
      staleAfterMs: Long = TxLog.InFlightGraceMs): TreeRecovery = {
    val f = fs(spark, txnDir)
    val dir = new Path(txnDir)
    if (!f.exists(dir)) return TreeRecovery(Nil, Nil)
    val names = f.listStatus(dir).toSeq.map(_.getPath.getName)
    names.filter(n => n.startsWith("txn-") && n.contains(".tmp-")).foreach { n =>
      val p = new Path(txnDir, n)
      if (ageOf(f, p) >= staleAfterMs)
        try f.delete(p, false) catch { case _: Throwable => () }
    }
    val ids = names
      .filterNot(_.contains(".tmp-"))
      .filter(n => n.startsWith("txn-") && (n.endsWith(".staged") ||
        n.endsWith(".committing") || n.endsWith(".commit") ||
        n.endsWith(".rolling") || n.endsWith(".staging")))
      .map(_.stripPrefix("txn-").stripSuffix(".staged")
        .stripSuffix(".committing").stripSuffix(".commit")
        .stripSuffix(".rolling").stripSuffix(".staging"))
      .distinct.sorted
    val fwd = scala.collection.mutable.ListBuffer.empty[String]
    val back = scala.collection.mutable.ListBuffer.empty[String]

    def damaged(id: String): Nothing = throw new IllegalStateException(
      s"damaged transaction record txn-$id in $txnDir — present but " +
        "unreadable; repair or remove it explicitly")

    def eraseRolledBack(id: String, rl: Path): Unit = {
      try f.delete(new Path(s"$txnDir/stage-$id"), true)
      catch { case _: Throwable => () }
      try f.delete(new Path(txnDir, s"txn-$id.commit"), false)
      catch { case _: Throwable => () }
      try f.delete(new Path(txnDir, s"txn-$id.staging"), false)
      catch { case _: Throwable => () }
      f.delete(rl, false)
      back += id
    }

    ids.foreach { id =>
      val sg = new Path(txnDir, s"txn-$id.staging")
      val sp = new Path(txnDir, s"txn-$id.staged")
      val cp = new Path(txnDir, s"txn-$id.commit")
      val cm = new Path(txnDir, s"txn-$id.committing")
      val rl = new Path(txnDir, s"txn-$id.rolling")
      if (readFile(f, rl).isDefined) eraseRolledBack(id, rl)
      else if (f.exists(rl)) damaged(id)
      else readFile(f, cp) match {
        case Some(writes) =>
          if (f.exists(cm)) {
            publishAll(spark, txnDir, id, writes, _ => ()); fwd += id
          } else if (f.exists(sp)) {
            // crash between record and claim: finish the decide for a
            // STALE intent; the claim rename arbitrates any race
            if (ageOf(f, sp) >= staleAfterMs && TxLog.renameClaim(f, sp, cm)) {
              publishAll(spark, txnDir, id, writes, _ => ()); fwd += id
            }
          } else {
            // record present, claim token consumed, no marker: resolve
            // from actual state — every tree published (marker == id) OR
            // restorable from a marker-carrying set-aside capture closes
            // forward; none published, none staged, none captured erases
            // the stray record; anything else is torn and fails loud
            val oldDir = new Path(s"$txnDir/old-$id")
            def captured(n: String): Boolean =
              (try f.listStatus(oldDir).toSeq.map(_.getPath)
               catch { case _: java.io.FileNotFoundException => Nil })
                .filter(p => p.getName == n ||
                  p.getName.startsWith(s"$n-aside-"))
                .exists(p => markerIdOf(f, p).contains(id))
            val st = writes.map { case (n, d) =>
              (n, markerIdOf(f, new Path(d)).contains(id) || captured(n),
                f.exists(new Path(s"$txnDir/stage-$id/$n")))
            }
            if (st.forall(_._2)) {
              publishAll(spark, txnDir, id, writes, _ => ()); fwd += id
            } else if (st.forall(s => !s._2 && !s._3)) {
              try f.delete(cp, false) catch { case _: Throwable => () }
              back += id
            } else if (st.forall(s => s._2 || s._3)) {
              // unpublished trees still staged: unreachable without a
              // claim marker, but resolvable — refuse silently guessing
              damaged(id)
            } else damaged(id)
          }
        case None if f.exists(cp) =>
          // truncated record = crash mid-decide before the claim: not a
          // decision; roll back from the intent, claim-first
          readFile(f, sp) match {
            case Some(_) =>
              if (ageOf(f, sp) >= staleAfterMs && TxLog.renameClaim(f, sp, rl))
                eraseRolledBack(id, rl)
            case None => damaged(id)
          }
        case None =>
          if (f.exists(cm)) {
            try f.delete(cm, false) catch { case _: Throwable => () }
          } else readFile(f, sp) match {
            case Some(_) =>
              if (ageOf(f, sp) >= staleAfterMs && TxLog.renameClaim(f, sp, rl))
                eraseRolledBack(id, rl)
            case None if f.exists(sp) => damaged(id)
            case None =>
              if (f.exists(sg)) {
                // staging beacon only: an in-flight job, or a dead one's
                // litter. Sweep only when the beacon AND the newest
                // write under the stage dir are both stale.
                val stageDir = new Path(s"$txnDir/stage-$id")
                if (ageOf(f, sg) >= staleAfterMs &&
                    newestMtime(f, stageDir) <=
                      System.currentTimeMillis() - staleAfterMs) {
                  try f.delete(stageDir, true) catch { case _: Throwable => () }
                  f.delete(sg, false)
                  back += id
                }
              }
              // else: completed and forgotten concurrently — healthy
          }
      }
    }
    TreeRecovery(fwd.toSeq, back.toSeq)
  }

  private def ageOf(f: FileSystem, p: Path): Long =
    try System.currentTimeMillis() - f.getFileStatus(p).getModificationTime
    catch { case _: java.io.FileNotFoundException => Long.MaxValue }

  /** Newest modification time under `dir`, recursively; MinValue when
    * absent/empty (counts as infinitely stale).
    */
  private def newestMtime(f: FileSystem, dir: Path): Long =
    try {
      val it = f.listFiles(dir, true)
      var newest = f.getFileStatus(dir).getModificationTime
      while (it.hasNext) {
        val s = it.next()
        if (s.getModificationTime > newest) newest = s.getModificationTime
      }
      newest
    } catch { case _: java.io.FileNotFoundException => Long.MinValue }
}
