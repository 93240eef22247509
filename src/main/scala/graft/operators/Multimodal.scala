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
  * means from the decoded raster. AUDIO decode is REAL for RIFF/PCM
  * WAV: [[decodeWav]] walks the container chunks and scans PCM16
  * samples for exact integer signal features. Video decode remains a
  * STUB (this container has no ffmpeg): a deterministic function of the
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
  private def decodeOne(row: ImageRow): ImageMeta = {
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

  def decodeImages(spark: SparkSession, imgs: DataFrame): DataFrame = {
    import spark.implicits._
    imgs.select(col("doc_id").cast("long"), col("img"))
      .as[ImageRow]
      .mapPartitions(_.map(decodeOne))
      .toDF()
  }

  /** REAL image resize: decode → Graphics2D bilinear rescale to
    * (targetW, targetH) → lossless PNG re-encode. Map-only like
    * [[decodeImages]]; the output column is again an opaque binary
    * payload, so resizes compose with decode/quarantine/frame-sample in
    * the same pipeline algebra. On solid-color inputs any interpolation
    * is exact (a convex combination of a constant is the constant), so
    * the whole decode→resize→re-decode roundtrip is oracle-checkable
    * arithmetic — which is what q146 pins.
    */
  def resizeImages(spark: SparkSession, imgs: DataFrame,
      targetW: Int, targetH: Int): DataFrame = {
    require(targetW >= 1 && targetH >= 1, s"bad target ${targetW}x$targetH")
    import spark.implicits._
    imgs.select(col("doc_id").cast("long"), col("img"))
      .as[ImageRow]
      .mapPartitions(_.map { row =>
        val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.img))
        require(src != null, s"undecodable payload for doc ${row.doc_id}")
        val dst = new java.awt.image.BufferedImage(
          targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g2 = dst.createGraphics()
        try {
          g2.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g2.drawImage(src, 0, 0, targetW, targetH, null)
        } finally g2.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", bos)
        ImageRow(row.doc_id, bos.toByteArray)
      })
      .toDF()
  }

  /** Pattern PNG generator — fixture tooling for the perceptual-hash
    * path. Unlike [[encodePng]]'s solid fills (whose aHash is degenerate:
    * every cell equals the mean), these are resolution-independent
    * grayscale patterns in normalized coordinates, so the SAME class
    * rendered at DIFFERENT sizes average-pools to the same 8×8 signature
    * while distinct classes stay far apart in Hamming space (the spec
    * measures both margins).
    */
  def encodePatternPng(width: Int, height: Int, cls: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      val v = if (height == 1) 0.0 else y.toDouble / (height - 1)
      var x = 0
      while (x < width) {
        val u = if (width == 1) 0.0 else x.toDouble / (width - 1)
        // Every pattern keeps all 8×8 block means ≥ ~10 gray levels away
        // from the global mean (checked in MultimodalSpec), so the hash
        // bit never sits on the threshold where per-size quantization
        // noise could flip it. E.g. the naive diagonal (u+v)/2 has its
        // whole anti-diagonal EXACTLY at the mean — excluded by design;
        // the bowl's cell sums (2i−7)²+(2j−7)² can never hit the mean 42
        // (no two odd squares sum to it).
        val lum = (cls % 7) match {
          case 0 => u * 255.0
          case 1 => v * 255.0
          case 2 => if ((u < 0.5) ^ (v < 0.5)) 25.0 else 230.0
          case 3 => (1.0 - u) * 255.0
          case 4 => (1.0 - v) * 255.0
          case 5 =>
            val du = 2.0 * u - 1.0; val dv = 2.0 * v - 1.0
            (du * du + dv * dv) / 2.0 * 255.0
          case 6 => if ((u < 0.5) ^ (v < 0.5)) 230.0 else 25.0
        }
        val c = math.max(0, math.min(255, lum.toInt))
        img.setRGB(x, y, (c << 16) | (c << 8) | c)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  final case class ImageHash(doc_id: Long, ahash: Long)

  /** 64-bit average-pool perceptual hash (aHash): decode → 8×8 block
    * means over luminance → bit = block mean > global mean. Map-only;
    * the hash is a deterministic pure function of the pixels, so
    * re-encoded/resized copies of the same content land on (near-)equal
    * hashes. Requires ≥8×8 inputs.
    */
  def aHash64(spark: SparkSession, imgs: DataFrame): DataFrame = {
    import spark.implicits._
    imgs.select(col("doc_id").cast("long"), col("img"))
      .as[ImageRow]
      .mapPartitions(_.map { row =>
        val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.img))
        require(bi != null, s"undecodable payload for doc ${row.doc_id}")
        val (w, h) = (bi.getWidth, bi.getHeight)
        require(w >= 8 && h >= 8, s"aHash needs >=8x8, got ${w}x$h for doc ${row.doc_id}")
        val cell = Array.ofDim[Double](64)
        var j = 0
        while (j < 8) {
          val y0 = j * h / 8; val y1 = (j + 1) * h / 8
          var i = 0
          while (i < 8) {
            val x0 = i * w / 8; val x1 = (i + 1) * w / 8
            var s = 0L; var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val p = bi.getRGB(x, y)
                s += (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
                x += 1
              }
              y += 1
            }
            cell(j * 8 + i) = s.toDouble / ((y1 - y0).toLong * (x1 - x0))
            i += 1
          }
          j += 1
        }
        val mean = cell.sum / 64.0
        var bits = 0L
        var k = 0
        while (k < 64) {
          if (cell(k) > mean) bits |= (1L << k)
          k += 1
        }
        ImageHash(row.doc_id, bits)
      })
      .toDF()
  }

  /** Perceptual near-duplicate image join: aHash → 4×16-bit LSH bands →
    * banded self-join → exact Hamming verify with `bit_count(xor)`.
    * Pigeonhole guarantee: any pair within Hamming ≤ 3 of 64 bits agrees
    * on at least one of the 4 bands, so banding loses no true pair at
    * the default threshold. The payload never shuffles — only the
    * (doc_id, band, bucket) triples and the 8-byte hashes move.
    */
  def imageNearDup(spark: SparkSession, imgs: DataFrame,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, s"4x16 banding only covers hamming<=3, got $maxHamming")
    val hashes = aHash64(spark, imgs)
    val bands = hashes
      .select(col("doc_id"), col("ahash"),
        explode(expr("sequence(0, 3)")).as("band"))
      .withColumn("bucket",
        expr("(ahash >> (band * 16)) & 65535"))
      .select(col("doc_id"), col("band"), col("bucket"))
    val cand = bands.as("ba").join(bands.as("bb"),
        col("ba.band") === col("bb.band") &&
          col("ba.bucket") === col("bb.bucket") &&
          col("ba.doc_id") < col("bb.doc_id"))
      .select(col("ba.doc_id").as("id_a"), col("bb.doc_id").as("id_b"))
      .distinct()
    cand
      .join(hashes.select(col("doc_id").as("id_a"), col("ahash").as("ha")), Seq("id_a"))
      .join(hashes.select(col("doc_id").as("id_b"), col("ahash").as("hb")), Seq("id_b"))
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"))
  }

  final case class SafeImageMeta(
      doc_id: Long, status: String, width: Option[Int], height: Option[Int],
      format: Option[String], mean_r: Option[Int], mean_g: Option[Int],
      mean_b: Option[Int])

  /** Poison-pill-safe decode: corrupt payloads become `status = "error"`
    * rows with null features instead of failing the task — at 100 TB a
    * handful of truncated blobs must not kill the job or poison task
    * retries. Same map-only shape as [[decodeImages]]; the strict
    * variant remains for pipelines that prefer failing loudly.
    */
  def decodeImagesSafe(spark: SparkSession, imgs: DataFrame): DataFrame = {
    import spark.implicits._
    imgs.select(col("doc_id").cast("long"), col("img"))
      .as[ImageRow]
      .mapPartitions(_.map { row =>
        scala.util.Try(decodeOne(row)) match {
          case scala.util.Success(m) => SafeImageMeta(row.doc_id, "ok",
            Some(m.width), Some(m.height), Some(m.format),
            Some(m.mean_r), Some(m.mean_g), Some(m.mean_b))
          case scala.util.Failure(_) => SafeImageMeta(row.doc_id, "error",
            None, None, None, None, None, None)
        }
      })
      .toDF()
  }

  final case class AudioRow(doc_id: Long, wav: Array[Byte])
  final case class AudioMeta(
      doc_id: Long, format: String, channels: Int, sample_rate: Int,
      bits: Int, n_samples: Long, duration_ms: Long, peak_abs: Int,
      energy: Long)

  /** Encode 16-bit PCM WAV — fixture/test tooling for the real audio
    * decode (PCM is lossless, so planted waveforms survive the roundtrip
    * exactly and decode output is oracle-checkable integer arithmetic).
    * `junkChunk` inserts a LIST chunk before fmt to exercise the decoder's
    * chunk walk.
    */
  def encodeWav(sampleRate: Int, samples: Array[Short],
      junkChunk: Boolean = false): Array[Byte] = {
    val dataLen = samples.length * 2
    val junkLen = if (junkChunk) 8 + 7 + 1 else 0 // odd 7-byte payload + pad
    val bb = java.nio.ByteBuffer.allocate(44 + junkLen + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII"))
    bb.putInt(36 + junkLen + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    if (junkChunk) {
      bb.put("LIST".getBytes("US-ASCII")); bb.putInt(7)
      bb.put("INFOx21".getBytes("US-ASCII")); bb.put(0.toByte) // even padding
    }
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(sampleRate); bb.putInt(sampleRate * 2)
    bb.putShort(2); bb.putShort(16) // block align, bits
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** REAL audio decode: RIFF/WAVE container walk (chunk iteration with
    * RIFF even-byte padding — not fixed offsets) + PCM16 sample scan.
    * Emits rate/duration metadata plus two exact integer signal features:
    * peak |amplitude| and total energy (Σ s²) — the loudness /
    * silence-detection primitives an audio-corpus sweep filters on.
    * Map-only like [[decodeImages]]; malformed payloads fail loudly.
    */
  /** Parsed RIFF/WAVE container: buffer + fmt fields + data span. */
  private final case class WavInfo(
      bb: java.nio.ByteBuffer, channels: Int, rate: Int, bits: Int,
      dataOff: Int, dataLen: Int)

  private def walkWav(docId: Long, wav: Array[Byte]): WavInfo = {
    val bb = java.nio.ByteBuffer.wrap(wav)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", s"not RIFF for doc $docId")
    bb.getInt // container size
    require(fourcc() == "WAVE", s"not WAVE for doc $docId")
    var channels = -1; var rate = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (bb.remaining() >= 8) {
      val id = fourcc()
      val size = bb.getInt
      val next = bb.position() + size + (size & 1) // RIFF pads to even
      id match {
        case "fmt " =>
          val audioFormat = bb.getShort
          require(audioFormat == 1, s"non-PCM wav for doc $docId")
          channels = bb.getShort
          rate = bb.getInt
          bb.getInt; bb.getShort // byte rate, block align
          bits = bb.getShort
        case "data" =>
          dataOff = bb.position(); dataLen = size
        case _ => // skip unknown chunks (LIST, INFO, ...)
      }
      bb.position(next)
    }
    require(rate > 0 && dataOff >= 0, s"missing fmt/data for doc $docId")
    require(bits == 16, s"only PCM16 supported, got $bits")
    WavInfo(bb, channels, rate, bits, dataOff, dataLen)
  }

  def decodeWav(spark: SparkSession, audio: DataFrame): DataFrame = {
    import spark.implicits._
    audio.select(col("doc_id").cast("long"), col("wav"))
      .as[AudioRow]
      .mapPartitions { it =>
        it.map { row =>
          val w = walkWav(row.doc_id, row.wav)
          val n = w.dataLen / 2 / w.channels
          var peak = 0; var energy = 0L
          var i = 0
          while (i < w.dataLen / 2) {
            val s = w.bb.getShort(w.dataOff + i * 2).toInt
            val a = math.abs(s)
            if (a > peak) peak = a
            energy += s.toLong * s
            i += 1
          }
          AudioMeta(row.doc_id, "wav", w.channels, w.rate, w.bits, n.toLong,
            n.toLong * 1000L / w.rate, peak, energy)
        }
      }
      .toDF()
  }

  final case class AudioPrint(doc_id: Long, half_period: Int, n_samples: Long)

  /** Deterministic square-tone fixture for the fingerprint path: period-p
    * alternation at amplitude A — crossings are amplitude- and
    * length-independent, so the SAME tone class re-rendered at different
    * lengths/volumes fingerprints identically.
    */
  def encodeToneWav(sampleRate: Int, nSamples: Int, period: Int,
      amplitude: Short): Array[Byte] = {
    require(period >= 2 && period % 2 == 0, s"even period >= 2, got $period")
    val samples = Array.tabulate[Short](nSamples)(i =>
      if ((i % period) < period / 2) amplitude else (-amplitude).toShort)
    encodeWav(sampleRate, samples)
  }

  /** Audio content fingerprint: dominant half-period from the PCM16
    * zero-crossing count — an exact integer (`n div crossings`) that is
    * invariant to amplitude and, for n ≫ period², to clip length. The
    * audio analogue of [[aHash64]]: REAL container decode, map-only,
    * narrow output.
    */
  def audioFingerprint(spark: SparkSession, audio: DataFrame): DataFrame = {
    import spark.implicits._
    audio.select(col("doc_id").cast("long"), col("wav"))
      .as[AudioRow]
      .mapPartitions(_.map { row =>
        val w = walkWav(row.doc_id, row.wav)
        val n = w.dataLen / 2
        var crossings = 0L
        var prev = w.bb.getShort(w.dataOff).toInt
        var i = 1
        while (i < n) {
          val s = w.bb.getShort(w.dataOff + i * 2).toInt
          if ((prev > 0 && s < 0) || (prev < 0 && s > 0)) crossings += 1
          if (s != 0) prev = s
          i += 1
        }
        val hp = if (crossings == 0) 0 else (n / crossings).toInt
        AudioPrint(row.doc_id, hp, n.toLong)
      })
      .toDF()
  }

  /** Duplicate-audio pairs by exact fingerprint match — one shuffle of
    * (doc_id, half_period); payload bytes never move past the map-only
    * fingerprint scan.
    */
  def audioDupPairs(spark: SparkSession, audio: DataFrame): DataFrame = {
    val fp = audioFingerprint(spark, audio).select(col("doc_id"), col("half_period"))
    fp.as("fa").join(fp.as("fb"),
        col("fa.half_period") === col("fb.half_period") &&
          col("fa.doc_id") < col("fb.doc_id"))
      .select(col("fa.doc_id").as("id_a"), col("fb.doc_id").as("id_b"))
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
