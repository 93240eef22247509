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
}
