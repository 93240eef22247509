package graft

import java.net.URI

import org.apache.hadoop.fs.{FSDataOutputStream, FileUtil, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Object-store-flavored Hadoop FS for specs (scheme `chaos:///...`),
  * backing the TxLog commit protocol's non-local-FS claims:
  *
  *  - `rename` is COPY + DELETE, never atomic — the S3-style semantics
  *    Spark's output committers and the TxLog design must survive
  *    (TxLog never renames; data dirs are immutable, commits are
  *    create-exclusive manifest writes);
  *  - [[ChaosFileSystem.failNextManifestWrite]] arms a one-shot fault:
  *    the next `create()` of a `v*` manifest file succeeds (the path is
  *    CLAIMED on disk) but every write to the stream throws — the
  *    connection-lost-mid-manifest failure whose cleanup round-5 advice
  *    demanded (the claimed v-file must be deleted, never left as a
  *    truncated committed version).
  *
  * Register with `conf.set("fs.chaos.impl", classOf[ChaosFileSystem].getName)`.
  */
class ChaosFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "chaos"
  override def getUri: URI = URI.create("chaos:///")

  override def rename(src: Path, dst: Path): Boolean =
    FileUtil.copy(this, src, this, dst, true /* delete source */, getConf)

  private def maybeFault(f: Path, out: FSDataOutputStream): FSDataOutputStream =
    if (f.getName.matches("v[0-9]+") &&
        ChaosFileSystem.failNextManifestWrite.getAndSet(false)) {
      out.close() // the claimed (empty) file stays on disk
      new FSDataOutputStream(new java.io.OutputStream {
        override def write(b: Int): Unit =
          throw new java.io.IOException("chaos: connection lost mid-write")
      }, null)
    } else out

  // RawLocalFileSystem routes FileSystem.create(Path, boolean) through
  // the permissionless 6-arg overload, so BOTH create paths need the
  // fault hook.
  override def create(
      f: Path,
      overwrite: Boolean,
      bufferSize: Int,
      replication: Short,
      blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    maybeFault(f,
      super.create(f, overwrite, bufferSize, replication, blockSize, progress))

  override def create(
      f: Path,
      permission: FsPermission,
      overwrite: Boolean,
      bufferSize: Int,
      replication: Short,
      blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    maybeFault(f, super.create(
      f, permission, overwrite, bufferSize, replication, blockSize, progress))
}

object ChaosFileSystem {
  val failNextManifestWrite = new java.util.concurrent.atomic.AtomicBoolean(false)
}
