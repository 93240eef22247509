package graft.jobs

import graft.routing._
import graft.sources.TableIO
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Missing-pairs reconciliation — the reference's recovery loop
  * (`data/scripts/fix_missing.sh`: find chunks with missing pairs,
  * re-run them, merge) as one in-engine job. At national scale transient
  * routing failures are routine; the recovery contract is:
  *
  *  1. re-route ONLY the published missing (origin, destination) pairs —
  *     never the full matrix;
  *  2. append newly-routable rows to the `times` tree through the same
  *     ordered-publish sink (per-file row-group order survives; the tree
  *     accretes files, which [[graft.sources.TableIO.compact]] folds);
  *  3. rewrite `missing_pairs` to the still-missing remainder, derived
  *     from the WRITTEN tree (the same write-once principle as
  *     [[CalculateTimes]] — no in-memory matrix is trusted twice);
  *  4. pair-count conservation holds at every step:
  *     |times| + |missing| is invariant.
  *
  * Scale shape: the re-route sub-matrix is the product of the missing
  * pairs' DISTINCT origin and destination ids — usually a vanishing
  * fraction of the full OD space. Off-product cells that were already
  * routed are filtered by a semi-join against the missing set before
  * anything is appended, so the times tree never sees a duplicate pair.
  */
object Reconcile {

  final case class Result(
      nMissingBefore: Long, nReconciled: Long, nStillMissing: Long)

  /** Re-route the published missing pairs of `outDir` through `router`
    * (typically a fresh/healthy instance of the same backend) and merge.
    * Points are re-read from the published points table — snapped coords,
    * exactly what the original run routed (`use_snapped` contract).
    */
  def missingPairs(
      spark: SparkSession,
      outDir: String,
      router: Router,
      cfg: CalculateTimes.Config,
      oSplit: Int = 5000,
      dSplit: Int = 5000,
      maxDepth: Int = 12): Result = {
    import spark.implicits._
    val timesDir = s"$outDir/times"
    val missingDir = s"$outDir/missing_pairs"
    val pointsDir = s"$outDir/points"

    val nBefore = Pipeline.countPartitioned(spark, missingDir)
    if (nBefore == 0) return Result(0, 0, 0)

    val missing = TableIO.readPartitioned(spark, missingDir)
      .select("origin_id", "destination_id")
    // bounded state: the distinct ids of the failed pairs (id strings
    // only; at the reference's scale missing pairs are a thin slice, and
    // the routed payload never rides this frame)
    val points = TableIO.readPartitioned(spark, pointsDir)
    def side(pointType: String, idCol: String) = points
      .filter(col("point_type") === pointType)
      .join(missing.select(col(idCol).as("id")).distinct(), Seq("id"), "left_semi")
      .select(col("id"), col("lon_snapped").as("lon"), col("lat_snapped").as("lat"))
      .as[RoutePoint]

    val rerouted = TravelTimeMatrix.run(
      spark, side("origin", "origin_id"), side("destination", "destination_id"),
      router, oSplit, dSplit, maxDepth).toDF()

    val partCols: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => df
        .withColumn("version", lit(cfg.version))
        .withColumn("mode", lit(cfg.mode))
        .withColumn("year", lit(cfg.year))
        .withColumn("geography", lit(cfg.geography))
        .withColumn("state", CalculateTimes.stateOf(col("origin_id")))
        .withColumn("centroid_type", lit(cfg.centroidType))

    // only pairs that were actually missing AND now routed are merged —
    // the rest of the sub-product is already in the tree
    val fixed = rerouted
      .filter(col("duration_sec").isNotNull)
      .join(missing, Seq("origin_id", "destination_id"), "left_semi")
    TableIO.writePartitioned(
      partCols(fixed), timesDir, Seq("origin_id", "destination_id"),
      bloomCols = Seq("destination_id" -> 100000L),
      mode = "append")

    // still-missing = published missing minus what the WRITTEN tree now
    // covers (2-column pruned scan of the appended tree)
    val covered = spark.read.parquet(timesDir)
      .select("origin_id", "destination_id")
    val still = missing.join(covered, Seq("origin_id", "destination_id"), "left_anti")

    // rewrite missing_pairs via tmp + swap (it is being read lazily above,
    // so an in-place overwrite would clobber its own input)
    val tmp = s"$missingDir.reconcile_tmp"
    TableIO.writePartitioned(
      partCols(still).select("version", "mode", "year", "geography", "state",
        "centroid_type", "origin_id", "destination_id"),
      tmp, Seq("origin_id", "destination_id"))
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(missingDir), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(missingDir))

    val nAfter = Pipeline.countPartitioned(spark, missingDir)
    Result(nBefore, nBefore - nAfter, nAfter)
  }
}
