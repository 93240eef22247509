package graft

import graft.geo.Geometry
import graft.sources.Shapefile
import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite

/** S4 shapefile ingestion. The reader is validated against BYTES
  * ASSEMBLED BY HAND in this spec (offsets straight from the ESRI
  * white paper / dBASE III layout), so its correctness never rests on
  * symmetry with our fixture writer; the writer is then checked by
  * roundtrip through the hand-validated reader.
  */
class ShapefileSpec extends AnyFunSuite {
  import SparkTestSession._

  /** One Polygon record: outer square (0,0)-(8,8) with hole (2,2)-(4,4),
    * laid out field-by-field per the spec.
    */
  private def handShp(): Array[Byte] = {
    val outer = Array((0.0, 0.0), (8.0, 0.0), (8.0, 8.0), (0.0, 8.0), (0.0, 0.0))
    val hole = Array((2.0, 2.0), (2.0, 4.0), (4.0, 4.0), (4.0, 2.0), (2.0, 2.0))
    val nPts = outer.length + hole.length
    val contentLen = 4 + 32 + 4 + 4 + 4 * 2 + 16 * nPts // type+bbox+counts+parts+points
    val buf = ByteBuffer.allocate(100 + 8 + contentLen)
    buf.order(ByteOrder.BIG_ENDIAN)
    buf.putInt(0, 9994)                       // file code
    buf.putInt(24, (100 + 8 + contentLen) / 2) // file length in 16-bit words
    buf.putInt(100, 1)                        // record number
    buf.putInt(104, contentLen / 2)           // content length in words
    buf.order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(28, 1000)                      // version
    buf.putInt(32, 5)                         // header shape type: polygon
    var p = 108
    buf.putInt(p, 5); p += 4                  // record shape type
    Seq(0.0, 0.0, 8.0, 8.0).foreach { d => buf.putDouble(p, d); p += 8 } // bbox
    buf.putInt(p, 2); p += 4                  // numParts
    buf.putInt(p, nPts); p += 4               // numPoints
    buf.putInt(p, 0); p += 4                  // ring 0 starts at point 0
    buf.putInt(p, outer.length); p += 4       // ring 1 starts after outer
    (outer ++ hole).foreach { case (x, y) =>
      buf.putDouble(p, x); p += 8; buf.putDouble(p, y); p += 8
    }
    buf.array()
  }

  /** dbf: fields GEOID20 (C,5) and ALAND20 (N,10,0); one live record,
    * one soft-deleted record.
    */
  private def handDbf(): Array[Byte] = {
    val headerSize = 32 + 32 * 2 + 1
    val recordSize = 1 + 5 + 10
    val buf = ByteBuffer.allocate(headerSize + recordSize * 2 + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(0, 0x03.toByte)
    buf.putInt(4, 2)                          // record count (incl deleted)
    buf.putShort(8, headerSize.toShort)
    buf.putShort(10, recordSize.toShort)
    def field(at: Int, name: String, typ: Char, len: Int): Unit = {
      name.getBytes("ASCII").zipWithIndex.foreach { case (b, i) => buf.put(at + i, b) }
      buf.put(at + 11, typ.toByte)
      buf.put(at + 16, len.toByte)
    }
    field(32, "GEOID20", 'C', 5)
    field(64, "ALAND20", 'N', 10)
    buf.put(96, 0x0d.toByte)
    def rec(at: Int, flag: Byte, geoid: String, aland: String): Unit = {
      buf.put(at, flag)
      geoid.padTo(5, ' ').getBytes("ASCII").zipWithIndex.foreach { case (b, i) =>
        buf.put(at + 1 + i, b) }
      aland.reverse.padTo(10, ' ').reverse.getBytes("ASCII").zipWithIndex.foreach {
        case (b, i) => buf.put(at + 6 + i, b) }
    }
    rec(97, ' ', "17031", "123456")
    rec(97 + recordSize, '*', "XXXXX", "9")   // deleted: must be skipped
    buf.array()
  }

  test("reader parses hand-assembled .shp bytes: 2-ring polygon, hole honored") {
    val polys = Shapefile.parseShp(handShp())
    assert(polys.length == 1)
    val p = polys.head
    assert(p.rings.length == 2)
    assert(p.rings(0).length == 5 && p.rings(1).length == 5)
    assert(p.contains(1.0, 1.0))   // solid
    assert(!p.contains(3.0, 3.0))  // hole
    assert(p.bbox == ((0.0, 0.0, 8.0, 8.0)))
  }

  test("reader parses hand-assembled .dbf bytes: types, trim, deleted-record skip") {
    val (fields, rows) = Shapefile.parseDbf(handDbf())
    assert(fields.map(_.name) == Seq("GEOID20", "ALAND20"))
    assert(fields.map(_.typ) == Seq('C', 'N'))
    assert(rows == Seq(Seq("17031", 123456L)))
  }

  test("zipped load: column lowercase + digit strip (census.py:92-95), wkt geometry") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("shp").toFile
    val zip = s"${dir.getAbsolutePath}/tl_2024_17_bg.zip"
    val fields = Seq(
      Shapefile.Field("GEOID20", 'C', 5, 0),
      Shapefile.Field("ALAND20", 'N', 10, 0),
      Shapefile.Field("AWATER20", 'N', 12, 2))
    val donut = Geometry.parseWkt(
      "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))")
    val rect = Geometry.parseWkt(Geometry.rectWkt(10, 10, 20, 20))
    Shapefile.writeZip(zip, "tl_2024_17_bg", fields, Seq(
      (Seq("17031", 1234L, 56.25), donut),
      (Seq("17043", 99L, 0.5), rect)))

    val df = Shapefile.loadZip(s, zip)
    assert(df.columns.toSeq == Seq("geoid", "aland", "awater", "wkt"))
    val rows = df.collect().sortBy(_.getString(0))
    assert(rows(0).getString(0) == "17031" && rows(0).getLong(1) == 1234L
      && rows(0).getDouble(2) == 56.25)
    // geometry survives with its hole: reparse and ray-cast
    val back = Geometry.parseWkt(rows(0).getString(3))
    assert(back.contains(1.0, 1.0) && !back.contains(3.0, 3.0))
    assert(Geometry.parseWkt(rows(1).getString(3)).contains(15.0, 15.0))
  }

  test("writer/reader roundtrip preserves multi-part geometry and numeric fields") {
    val dir = java.nio.file.Files.createTempDirectory("shp").toFile
    val zip = s"${dir.getAbsolutePath}/mp.zip"
    val two = Geometry.parseWkt(
      "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), ((6 6, 9 6, 9 9, 6 9, 6 6)))")
    Shapefile.writeZip(zip, "mp", Seq(Shapefile.Field("ID", 'N', 6, 0)),
      Seq((Seq(7L), two)))
    val (_, recs) = Shapefile.readZip(zip)
    assert(recs.length == 1 && recs.head.attrs == Seq(7L))
    val g = recs.head.geometry
    assert(g.rings.length == 2)
    assert(g.contains(2, 2) && g.contains(7, 7) && !g.contains(5, 5))
  }
}
