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

  // ------------------------------------------------------------------
  // REAL video metadata decode: a from-scratch ISO-BMFF (MP4) box
  // walker in the same style as the RIFF/PNG readers — nested
  // size+fourcc box iteration (big-endian per ISO/IEC 14496-12), not
  // fixed offsets. moov/mvhd gives timescale+duration, trak/tkhd the
  // track dimensions (16.16 fixed point), stbl/stts+stsz the sample
  // timeline and per-frame byte sizes. Frame PIXEL decode would need a
  // codec (none in this container); the metadata/timeline walk is the
  // part a 100 TB video-corpus sweep filters and samples on, and it is
  // fully real and oracle-proven here (planted boxes, arithmetic
  // features — the q116 pattern).
  // ------------------------------------------------------------------

  /** Minimal ISO-BMFF writer: ftyp + moov(mvhd, trak(tkhd, mdia(mdhd,
    * minf(stbl(stts, stsz))))) — one video track, one stts run. Enough
    * structure for [[walkMp4]] to prove itself on planted fixtures.
    */
  def encodeMp4(timescale: Int, durationTicks: Long, width: Int,
      height: Int, frameSizes: Array[Int]): Array[Byte] = {
    require(timescale > 0 && durationTicks >= 0 && frameSizes.nonEmpty)
    def be(words: Int*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(words.length * 4) // BIG_ENDIAN
      words.foreach(bb.putInt); bb.array()
    }
    def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val len = 8 + payload.map(_.length).sum
      val bb = java.nio.ByteBuffer.allocate(len)
      bb.putInt(len); bb.put(typ.getBytes("US-ASCII"))
      payload.foreach(bb.put); bb.array()
    }
    val matrix = be(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be(0x200),
      "isom".getBytes("US-ASCII"), "mp42".getBytes("US-ASCII"))
    val mvhd = box("mvhd",
      be(0, 0, 0, timescale, durationTicks.toInt, 0x10000), // v0, times, ts, dur, rate
      Array[Byte](1, 0, 0, 0),                              // volume 1.0 + reserved
      be(0, 0), matrix, be(0, 0, 0, 0, 0, 0), be(2))        // resv, predefined, next id
    val tkhd = box("tkhd",
      be(7, 0, 0, 1, 0, durationTicks.toInt, 0, 0), // v0+enabled flags, id 1, dur
      be(0, 0), matrix,                             // layer/group, volume/resv
      be(width << 16, height << 16))                // 16.16 fixed
    val mdhd = box("mdhd", be(0, 0, 0, timescale, durationTicks.toInt),
      Array[Byte](0x55, 0xC4.toByte, 0, 0)) // lang 'und' (packed 5-bit), predefined
    val delta = (durationTicks / frameSizes.length).toInt
    val stts = box("stts", be(0, 1, frameSizes.length, delta))
    val stsz = box("stsz", be(0, 0, frameSizes.length), be(frameSizes: _*))
    val stbl = box("stbl", stts, stsz)
    val trak = box("trak", tkhd, box("mdia", mdhd, box("minf", stbl)))
    ftyp ++ box("moov", mvhd, trak)
  }

  /** Parsed MP4 structure: movie timescale/duration, first video
    * track's dims, and the sample table (per-frame sizes + the stts
    * (count, delta) runs that place each frame on the media timeline).
    */
  private final case class Mp4Info(
      timescale: Int, durationTicks: Long, width: Int, height: Int,
      frameSizes: Array[Int], sttsRuns: Array[(Int, Int)])

  private def walkMp4(docId: Long, mp4: Array[Byte]): Mp4Info = {
    val bb = java.nio.ByteBuffer.wrap(mp4) // ISO-BMFF is big-endian
    def fourcc(at: Int): String = new String(mp4, at + 4, 4, "US-ASCII")
    var ts = -1; var dur = -1L; var w = -1; var h = -1
    var sizes: Array[Int] = null
    var runs: Array[(Int, Int)] = null
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")
    def walk(from: Int, to: Int): Unit = {
      var p = from
      while (p + 8 <= to) {
        val size = bb.getInt(p)
        require(size >= 8 && p + size <= to, s"bad box size $size for doc $docId")
        val typ = fourcc(p)
        val body = p + 8
        typ match {
          case t if containers(t) => walk(body, p + size)
          case "mvhd" =>
            val v = mp4(body) & 0xff
            if (v == 1) { ts = bb.getInt(body + 20); dur = bb.getLong(body + 24) }
            else { ts = bb.getInt(body + 12); dur = bb.getInt(body + 16).toLong }
          case "tkhd" if w < 0 => // first track only
            w = bb.getInt(p + size - 8) >>> 16 // 16.16 fixed, at payload end
            h = bb.getInt(p + size - 4) >>> 16
          case "stts" =>
            val n = bb.getInt(body + 4)
            runs = Array.tabulate(n)(i =>
              (bb.getInt(body + 8 + i * 8), bb.getInt(body + 12 + i * 8)))
          case "stsz" =>
            val uniform = bb.getInt(body + 4)
            val n = bb.getInt(body + 8)
            sizes =
              if (uniform != 0) Array.fill(n)(uniform)
              else Array.tabulate(n)(i => bb.getInt(body + 12 + i * 4))
          case _ => // ftyp, codecs, free space — skip
        }
        p += size
      }
    }
    walk(0, mp4.length)
    require(ts > 0 && dur >= 0, s"missing moov/mvhd for doc $docId")
    require(sizes != null && runs != null, s"missing stbl for doc $docId")
    require(runs.map(_._1.toLong).sum == sizes.length,
      s"stts/stsz sample-count mismatch for doc $docId")
    Mp4Info(ts, dur, w, h, sizes, runs)
  }

  final case class VideoMeta(doc_id: Long, format: String, timescale: Int,
      duration_ms: Long, width: Int, height: Int, n_frames: Long)

  /** REAL video metadata decode (the former stub): map-only box walk,
    * narrow output — payload bytes never shuffle.
    */
  def decodeMp4(spark: SparkSession, videos: DataFrame): DataFrame = {
    import spark.implicits._
    videos.select(col("doc_id").cast("long"), col("mp4").as("payload"))
      .as[MediaRow]
      .mapPartitions(_.map { m =>
        val v = walkMp4(m.doc_id, m.payload)
        VideoMeta(m.doc_id, "mp4", v.timescale,
          v.durationTicks * 1000L / v.timescale, v.width, v.height,
          v.frameSizes.length.toLong)
      })
      .toDF()
  }

  final case class FrameRow(doc_id: Long, frame_idx: Long,
      frame_bytes: Long, frame_t_ms: Long)

  /** Frame sampling — the one-to-many decode shape (video → N frames),
    * now driven by the REAL sample table: each frame row carries its
    * byte size (stsz) and its media-timeline timestamp (cumulative stts
    * deltas). flatMap-typed, map-only, fan-out bounded by the sample
    * count; a codec-backed pixel decode would slot into the same shape.
    */
  def sampleFrames(spark: SparkSession, videos: DataFrame): DataFrame = {
    import spark.implicits._
    videos.select(col("doc_id").cast("long"), col("mp4").as("payload"))
      .as[MediaRow]
      .flatMap { m =>
        val v = walkMp4(m.doc_id, m.payload)
        val deltas = v.sttsRuns.flatMap { case (n, d) => Array.fill(n)(d) }
        var tTicks = 0L
        v.frameSizes.iterator.zipWithIndex.map { case (sz, i) =>
          val row = FrameRow(m.doc_id, (i + 1).toLong, sz.toLong,
            tTicks * 1000L / v.timescale)
          tTicks += deltas(i)
          row
        }.toSeq
      }
      .toDF()
  }
}
