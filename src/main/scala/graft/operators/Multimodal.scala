package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded/feature-extracted in partition-batched typed
  * transforms.
  *
  * IMAGE decode is REAL: [[decodeImages]] parses PNG/JPEG payloads with
  * the JDK's built-in `javax.imageio` codecs (no native libs needed) —
  * format sniffed from magic bytes, dimensions and per-channel pixel
  * means from the decoded raster. Audio/video decode remains a STUB
  * (this container has no ffmpeg): a deterministic function of the
  * bytes standing in where the codec would be called per batch.
  *
  * At scale: payloads stay columnar (never shuffled unless the plan
  * requires it), decode is map-only, and decode output is a narrow
  * metadata row — the pattern for 100 TB image/audio sweeps.
  */
object Multimodal {

  final case class ImageRow(doc_id: Long, img: Array[Byte])
  final case class ImageMeta(
      doc_id: Long, width: Int, height: Int, format: String,
      mean_r: Int, mean_g: Int, mean_b: Int)

  /** Encode a solid-color PNG — fixture/test tooling for the real decode
    * path (PNG is lossless, so planted colors survive the roundtrip
    * exactly and decode output is oracle-checkable arithmetic).
    */
  def encodePng(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode: binary payload column → (dimensions, format,
    * per-channel means). Map-only `mapPartitions` (codec state per batch,
    * not per row); unreadable payloads surface as a decode error rather
    * than silent nulls — a corrupt-image quarantine filter belongs
    * upstream of this operator.
    */
  def decodeImages(spark: SparkSession, imgs: DataFrame): DataFrame = {
    import spark.implicits._
    imgs.select(col("doc_id").cast("long"), col("img"))
      .as[ImageRow]
      .mapPartitions { it =>
        it.map { row =>
          val fmt =
            if (row.img.length >= 8 && (row.img(0) & 0xff) == 0x89 &&
              row.img(1) == 'P') "png"
            else if (row.img.length >= 2 && (row.img(0) & 0xff) == 0xff &&
              (row.img(1) & 0xff) == 0xd8) "jpeg"
            else "unknown"
          val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.img))
          require(bi != null, s"undecodable payload for doc ${row.doc_id}")
          val (w, h) = (bi.getWidth, bi.getHeight)
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = bi.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          ImageMeta(row.doc_id, w, h, fmt,
            (sr / n).toInt, (sg / n).toInt, (sb / n).toInt)
        }
      }
      .toDF()
  }

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
