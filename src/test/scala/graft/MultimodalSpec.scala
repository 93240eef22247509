package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Real image decode (javax.imageio, pure JDK): format sniffing,
  * dimensions, channel means — PNG exactly, JPEG structurally (lossy).
  */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("PNG roundtrip: planted dimensions and exact channel means survive decode") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, 16, 8, 200, 10, 30),
      (2L, 9, 21, 0, 255, 127),
      (3L, 32, 32, 255, 255, 255))
    val imgs = rows.toDF("doc_id", "w", "h", "r", "g", "b")
      .as[(Long, Int, Int, Int, Int, Int)]
      .map { case (id, w, h, r, g, b) => (id, Multimodal.encodePng(w, h, r, g, b)) }
      .toDF("doc_id", "img")
    val got = Multimodal.decodeImages(s, imgs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3),
        r.getInt(4), r.getInt(5), r.getInt(6)))).toMap
    rows.foreach { case (id, w, h, r, g, b) =>
      assert(got(id) == ((w, h, "png", r, g, b)), s"doc $id")
    }
  }

  test("resize is real: target dims exact; solid colors survive; a half-half image averages") {
    val s = spark
    import s.implicits._
    val solid = Seq((1L, Multimodal.encodePng(24, 10, 200, 40, 90)))
      .toDF("doc_id", "img")
    val rs = Multimodal.decodeImages(s,
      Multimodal.resizeImages(s, solid, 7, 13)).collect().head
    assert((rs.getInt(1), rs.getInt(2)) == ((7, 13)), "target dims")
    assert((rs.getInt(4), rs.getInt(5), rs.getInt(6)) == ((200, 40, 90)),
      "solid color must survive any interpolation exactly")
    // left half black, right half white, width halved: mean stays ~127
    val img = new java.awt.image.BufferedImage(32, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 32)
      img.setRGB(x, y, if (x < 16) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val half = Seq((2L, bos.toByteArray)).toDF("doc_id", "img")
    val hm = Multimodal.decodeImages(s,
      Multimodal.resizeImages(s, half, 16, 8)).collect().head
    assert(math.abs(hm.getInt(4) - 127) <= 8,
      s"downscaled half/half image should average near 127, got ${hm.getInt(4)}")
  }

  test("JPEG decode is real: dimensions exact, means near-planted (lossy codec)") {
    val s = spark
    import s.implicits._
    // encode a JPEG via the same JDK codec family the decoder uses
    val bi = new java.awt.image.BufferedImage(24, 10,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 10; x <- 0 until 24) bi.setRGB(x, y, (100 << 16) | (150 << 8) | 50)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "jpeg", bos)
    val imgs = Seq((7L, bos.toByteArray)).toDF("doc_id", "img")
    val r = Multimodal.decodeImages(s, imgs).collect().head
    assert(r.getInt(1) == 24 && r.getInt(2) == 10)
    assert(r.getString(3) == "jpeg")
    // JPEG is lossy: means land near the planted color, not on it
    assert(math.abs(r.getInt(4) - 100) < 12 && math.abs(r.getInt(5) - 150) < 12
      && math.abs(r.getInt(6) - 50) < 12, r.toString)
  }

  test("undecodable payload fails loudly, not as silent nulls") {
    val s = spark
    import s.implicits._
    val junk = Seq((9L, Array.fill[Byte](64)(0x42))).toDF("doc_id", "img")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImages(s, junk).collect()
    }
    assert(e.getMessage.contains("undecodable") ||
      Option(e.getCause).exists(_.getMessage.contains("undecodable")))
  }

  test("wav roundtrip: known waveform decodes to exact integer features") {
    val s = spark
    import s.implicits._
    // 5 samples at 1000 Hz: 3, -4, 0, 7, -7 → peak 7, energy 9+16+0+49+49
    val samples = Array[Short](3, -4, 0, 7, -7)
    val wavs = Seq((1L, Multimodal.encodeWav(1000, samples))).toDF("doc_id", "wav")
    val r = Multimodal.decodeWav(s, wavs)
      .as[(Long, String, Int, Int, Int, Long, Long, Int, Long)].collect().head
    assert(r == ((1L, "wav", 1, 1000, 16, 5L, 5L, 7, 123L)))
  }

  test("wav chunk walk skips unknown odd-sized chunks (RIFF pad byte honored)") {
    val s = spark
    import s.implicits._
    val samples = Array[Short](100, -100)
    val plain = Multimodal.encodeWav(8000, samples)
    val padded = Multimodal.encodeWav(8000, samples, junkChunk = true)
    assert(padded.length > plain.length, "junk chunk not inserted")
    val both = Seq((1L, plain), (2L, padded)).toDF("doc_id", "wav")
    val out = Multimodal.decodeWav(s, both)
      .select("doc_id", "n_samples", "peak_abs", "energy")
      .as[(Long, Long, Int, Long)].collect().toSet
    assert(out == Set((1L, 2L, 100, 20000L), (2L, 2L, 100, 20000L)))
  }

  test("non-PCM wav fails loudly") {
    val s = spark
    import s.implicits._
    val wav = Multimodal.encodeWav(8000, Array[Short](1, 2))
    wav(20) = 3 // audioFormat LE low byte → 3 (IEEE float)
    val df = Seq((5L, wav)).toDF("doc_id", "wav")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeWav(s, df).collect()
    }
    assert(e.getMessage.contains("non-PCM") ||
      Option(e.getCause).exists(_.getMessage.contains("non-PCM")))
  }

  test("audio fingerprint: half-period exact, invariant to amplitude and length") {
    val s = spark
    import s.implicits._
    val wavs = (for {
      (p, cls) <- Seq((8, 0), (14, 1), (20, 2))
      (n, amp) <- Seq((4000, 500.toShort), (9000, 900.toShort), (5500, 300.toShort))
    } yield ((cls * 100 + n / 100).toLong,
      Multimodal.encodeToneWav(8000, n, p, amp), p / 2))
      .toDF("doc_id", "wav", "expect_hp")
    val got = Multimodal.audioFingerprint(s, wavs.select("doc_id", "wav"))
      .join(wavs.select($"doc_id", $"expect_hp"), "doc_id")
      .select("half_period", "expect_hp")
      .as[(Int, Int)].collect()
    assert(got.nonEmpty && got.forall { case (hp, exp) => hp == exp },
      s"fingerprints off: ${got.filter(g => g._1 != g._2).toSeq}")
  }

  test("audioDupPairs: exactly the same-tone-class pairs") {
    val s = spark
    import s.implicits._
    val wavs = (for (k <- 0L until 21L) yield
      (k, Multimodal.encodeToneWav(8000, 4000 + (k % 5).toInt * 500,
        8 + (k % 3).toInt * 4, (500 + (k % 4) * 100).toShort)))
      .toDF("doc_id", "wav")
    val got = Multimodal.audioDupPairs(s, wavs)
      .as[(Long, Long)].collect().toSet
    val expect = (for {
      a <- 0L until 21L; b <- a + 1 until 21L
      if a % 3 == b % 3
    } yield (a, b)).toSet
    assert(got == expect)
  }

  test("aHash: same pattern class pools to the SAME hash across render sizes") {
    val s = spark
    import s.implicits._
    // the exact size range q158 renders (w 32..40, h 24..30), all classes
    val imgs = (for {
      cls <- 0 until 7
      (w, h) <- Seq((32, 24), (36, 27), (40, 30), (33, 29))
    } yield ((cls * 100 + w * 10 + h).toLong,
      Multimodal.encodePatternPng(w, h, cls), cls))
      .toDF("doc_id", "img", "cls")
    val hashes = Multimodal.aHash64(s, imgs.select("doc_id", "img"))
      .join(imgs.select($"doc_id", $"cls"), "doc_id")
      .select($"cls", $"ahash").as[(Int, Long)].collect()
    val byCls = hashes.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    byCls.foreach { case (cls, hs) =>
      assert(hs.size == 1, s"class $cls hashed differently across sizes: $hs")
    }
    // inter-class margin: every pair of classes must sit beyond the
    // near-dup threshold with room to spare
    val reps = byCls.view.mapValues(_.head).toMap
    for (a <- 0 until 7; b <- a + 1 until 7) {
      val d = java.lang.Long.bitCount(reps(a) ^ reps(b))
      assert(d > 6, s"classes $a/$b too close in Hamming space: $d")
    }
  }

  test("MP4 walker: encode→decode roundtrip recovers every planted field") {
    val s = spark
    import s.implicits._
    val vids = Seq(
      (1L, Multimodal.encodeMp4(600, 1234L, 640, 360, Array(10, 20, 30))),
      (2L, Multimodal.encodeMp4(1800, 90000L, 1920, 1080, Array(512))))
      .toDF("doc_id", "mp4")
    val meta = Multimodal.decodeMp4(s, vids)
      .as[(Long, String, Int, Long, Int, Int, Long)].collect().sortBy(_._1).toSeq
    assert(meta == Seq(
      (1L, "mp4", 600, 1234L * 1000 / 600, 640, 360, 3L),
      (2L, "mp4", 1800, 50000L, 1920, 1080, 1L)))
    val frames = Multimodal.sampleFrames(s, vids)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // doc 1: delta = 1234/3 = 411 ticks → t_ms = 0, 685, 1370
    assert(frames == Seq(
      (1L, 1L, 10L, 0L), (1L, 2L, 20L, 411L * 1000 / 600),
      (1L, 3L, 30L, 822L * 1000 / 600),
      (2L, 1L, 512L, 0L)))
  }

  test("MP4 walker: version-1 mvhd (64-bit times) and uniform stsz parse too") {
    val s = spark
    import s.implicits._
    // hand-build: v1 mvhd (timescale at +20, 64-bit duration at +24) and
    // a uniform-size stsz — layouts the v0-only encoder never emits
    def be(words: Int*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(words.length * 4)
      words.foreach(bb.putInt); bb.array()
    }
    def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val len = 8 + payload.map(_.length).sum
      val bb = java.nio.ByteBuffer.allocate(len)
      bb.putInt(len); bb.put(typ.getBytes("US-ASCII")); payload.foreach(bb.put)
      bb.array()
    }
    val mvhdV1 = box("mvhd",
      Array[Byte](1, 0, 0, 0),      // version 1
      be(0, 0, 0, 0),               // 64-bit creation + modification
      be(1000),                     // timescale
      be(0, 5000),                  // 64-bit duration = 5000 ticks
      be(0x10000), Array[Byte](1, 0, 0, 0), be(0, 0),
      be(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000),
      be(0, 0, 0, 0, 0, 0), be(2))
    val tkhd = box("tkhd", be(7, 0, 0, 1, 0, 5000, 0, 0), be(0, 0),
      be(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000),
      be(320 << 16, 240 << 16))
    val stts = box("stts", be(0, 1, 4, 1250))
    val stszUniform = box("stsz", be(0, 99, 4)) // uniform size 99, 4 samples
    val moov = box("moov", mvhdV1,
      box("trak", tkhd, box("mdia", box("minf", box("stbl", stts, stszUniform)))))
    val vids = Seq((7L, moov)).toDF("doc_id", "mp4")
    val meta = Multimodal.decodeMp4(s, vids)
      .as[(Long, String, Int, Long, Int, Int, Long)].collect().toSeq
    assert(meta == Seq((7L, "mp4", 1000, 5000L, 320, 240, 4L)))
    val frames = Multimodal.sampleFrames(s, vids)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(frames.map(_._3).forall(_ == 99L))
    assert(frames.map(_._4) == Seq(0L, 1250L, 2500L, 3750L))
  }

  test("MP4 walker: malformed payloads fail loudly, not silently") {
    val s = spark
    import s.implicits._
    val bad = Seq((1L, Array.fill[Byte](64)(3))).toDF("doc_id", "mp4")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeMp4(s, bad).collect()
    }
    assert(e.getMessage != null)
  }

  test("imageNearDup: pairs are exactly the same-class pairs; payloads never shuffle") {
    val s = spark
    import s.implicits._
    val imgs = (for (k <- 0L until 42L) yield
      (k, Multimodal.encodePatternPng(32 + (k % 9).toInt, 24 + (k % 7).toInt,
        (k % 7).toInt)))
      .toDF("doc_id", "img")
    val got = Multimodal.imageNearDup(s, imgs)
      .as[(Long, Long)].collect().toSet
    val expect = (for {
      a <- 0L until 42L; b <- a + 1 until 42L
      if a % 7 == b % 7
    } yield (a, b)).toSet
    assert(got == expect)
  }
}
