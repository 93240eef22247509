package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded/feature-extracted in partition-batched typed
  * transforms. The Spark side — schema, batching shape, partitioning —
  * is real; the decode itself is a STUB (this container has no image
  * codecs): a deterministic function of the bytes standing in where
  * libjpeg/ffmpeg would be called per batch.
  *
  * At scale: payloads stay columnar (never shuffled unless the plan
  * requires it), decode is map-only, and decode output is a narrow
  * metadata row — the pattern for 100 TB image/audio sweeps.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int, format: String)

  /** STUB decoder — deterministic fake of an image-header parse. */
  def decodeStub(m: MediaRow): MediaMeta = {
    val n = m.payload.length
    MediaMeta(
      m.doc_id,
      n.toLong,
      n % 640,
      n * 7 % 480,
      (n % 3) match { case 0 => "png"; case 1 => "jpeg"; case _ => "webp" })
  }

  /** Attach binary payloads (here: utf-8 text bytes standing in for media
    * blobs) and run the batched decode.
    */
  def decodeMetadata(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
      .mapPartitions { it =>
        // batch boundary: a real impl would init the codec once here
        it.map(decodeStub)
      }
      .toDF()
  }

  final case class FrameRow(doc_id: Long, frame_idx: Long, frame_bytes: Long)

  /** Frame sampling — the one-to-many decode shape (video → N frames):
    * each payload yields `n_bytes % 4 + 1` frame rows. The STUB emits a
    * deterministic per-frame byte count where a real decoder would emit
    * the frame tensor; the flatMap-typed plumbing is the production
    * shape (map-only, output fan-out bounded per row).
    */
  def sampleFrames(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
      .flatMap { m =>
        val n = m.payload.length
        val frames = n % 4 + 1
        (1 to frames).map(i => FrameRow(m.doc_id, i.toLong, (n / frames).toLong))
      }
      .toDF()
  }
}
