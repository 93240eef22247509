package graft.routing

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A point before snapping. */
final case class RawPoint(id: String, lon: Double, lat: Double)

/** A snapped point — the reference's `points` table row minus point_type
  * (/root/reference/README.md:248-256, constants.py:29-44).
  */
final case class SnappedPoint(
    id: String,
    lon: Double,
    lat: Double,
    lon_snapped: Double,
    lat_snapped: Double,
    is_snapped: Boolean)

/** Pluggable nearest-network-location backend — the reference's per-point
  * OSRM `/nearest` HTTP call (/root/reference/data/src/utils/times.py:
  * 645-683). Batch-oriented so an HTTP impl can amortize connections per
  * partition. Returns None when the backend has no snap for a point (the
  * reference then falls back to the original coords via fillna).
  */
trait Snapper extends Serializable {
  def snap(batch: Seq[(Double, Double)]): Seq[Option[(Double, Double)]]
}

/** Deterministic synthetic snapper: rounds to the nearest 0.5° grid
  * (half-away-from-zero, matching SQL round()); refuses to snap points
  * above `noSnapAboveLat` to exercise the fallback path.
  */
final class GridSnapper(noSnapAboveLat: Double = Double.MaxValue) extends Snapper {
  private def half(v: Double): Double = math.floor(v * 2.0 + 0.5) / 2.0
  override def snap(batch: Seq[(Double, Double)]): Seq[Option[(Double, Double)]] =
    batch.map { case (lon, lat) =>
      if (lat > noSnapAboveLat) None else Some((half(lon), half(lat)))
    }
}

/** The snap operator (J7/R5): mapPartitions so each task issues one
  * batched backend call per bounded group — the Spark shape of the
  * reference's per-point HTTP loop. Per-backend-call work is capped at
  * `batchSize` points (the reference bounds per-request size the same
  * way, params.yaml max_split_size = 5000), so task memory is bounded by
  * the batch constant rather than the partition size. Coalesce-to-original
  * + is_snapped derivation are P6/P7 (times.py:680-682).
  */
object Snap {
  val DefaultBatchSize = 5000

  def apply(
      spark: SparkSession,
      points: Dataset[RawPoint],
      snapper: Snapper,
      batchSize: Int = DefaultBatchSize): Dataset[SnappedPoint] = {
    import spark.implicits._
    points.mapPartitions { it =>
      it.grouped(batchSize).flatMap { pts =>
        val snapped = snapper.snap(pts.map(p => (p.lon, p.lat)))
        pts.iterator.zip(snapped.iterator).map { case (p, s) =>
          val (slon, slat) = s.getOrElse((p.lon, p.lat)) // P6 coalesce fallback
          SnappedPoint(p.id, p.lon, p.lat, slon, slat,
            p.lon != slon || p.lat != slat) // P7 derived boolean
        }
      }
    }
  }

  /** The published `points` table: origins ∪ destinations with the
    * point_type partition level (times.py:168-172).
    */
  def pointsTable(origins: Dataset[SnappedPoint], dests: Dataset[SnappedPoint]): DataFrame = {
    origins.withColumn("point_type", lit("origin"))
      .unionByName(dests.withColumn("point_type", lit("destination")))
      .select(col("point_type"), col("id"), col("lon"), col("lat"),
        col("lon_snapped"), col("lat_snapped"), col("is_snapped"))
  }
}
