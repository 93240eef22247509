package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** The one pin primitive behind every eager multi-consumer checkpoint in
  * the operator library (round-12 verdict ask #5 unified them here).
  *
  * Two modes, one trade (documented first at
  * [[Dedup.minhashPairsIncremental]]):
  *
  *  - `localCheckpoint` (default): executor-storage blocks, no extra
  *    I/O path — right for single-node sessions and short-lived jobs,
  *    but the truncated lineage means ONE executor loss kills every
  *    query still reading the pin, and blocks squat in the block
  *    manager until the ContextCleaner's periodic GC.
  *  - reliable parquet round-trip under a checkpoint directory: the pin
  *    is recomputable-from-disk, survives executor churn, and its
  *    storage is a filesystem the operator of a 100 TB job already
  *    manages. The local bench never sets the gate, so benched plans
  *    and timings are identical to the localCheckpoint shape.
  *
  * The reliable mode is gated per session: set the Spark conf
  * `spark.graft.checkpointDir` (or env `SPARK_GRAFT_CKPT_DIR`) and every
  * [[pin]] call in the session lands under it. Operators with their own
  * private store (rolling-ingest signature dirs, per-round graph frames)
  * pass their dir explicitly through [[pinAt]] and keep deterministic
  * names for bounded storage.
  */
object Pins {
  private val seq = new java.util.concurrent.atomic.AtomicLong()

  /** Session-level reliable-checkpoint root: Spark conf first (runtime
    * settable), env as the deploy-time default.
    */
  def sessionDir(spark: org.apache.spark.sql.SparkSession): Option[String] =
    spark.conf.getOption("spark.graft.checkpointDir")
      .orElse(sys.env.get("SPARK_GRAFT_CKPT_DIR"))
      .filter(_.nonEmpty)

  /** Reliable pin: parquet round-trip under `dir/name`, name used
    * VERBATIM (mode=overwrite) — callers owning the directory rely on
    * deterministic names so repeated batches overwrite instead of
    * accrete (the rolling-ingest signature-store contract).
    */
  def pinAt(df: DataFrame, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name"
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** The general pin. Session gate set → reliable [[pinAt]] under a
    * COLLISION-FREE name (operator invocations nest and repeat inside
    * one query — e.g. madOutliers runs exactQuantiles twice, and with a
    * fixed name the second write would clobber a frame the first
    * result's plan still reads lazily); unset → eager localCheckpoint
    * at `storage`, the single-node fast path the bench measures.
    */
  def pin(df: DataFrame, name: String,
      storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    sessionDir(df.sparkSession) match {
      case Some(d) => pinAt(df, d, s"${name}_${seq.incrementAndGet()}")
      case None => df.localCheckpoint(true, storage)
    }

  /** [[pin]] with an operator-level dir override: `Some(dir)` pins
    * reliably there (verbatim name); `None` falls through to the
    * session gate.
    */
  def pin(df: DataFrame, name: String, storage: StorageLevel,
      dir: Option[String]): DataFrame =
    dir match {
      case Some(d) => pinAt(df, d, name)
      case None => pin(df, name, storage)
    }
}
