package graft.sources

import graft.geo.Geometry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, FileInputStream, FileOutputStream}
import java.util.zip.{Deflater, Inflater}
import scala.collection.mutable.ArrayBuffer

/** S12: OpenStreetMap `.pbf` source + boundary clip — the stage the
  * reference delegates to `osmium extract` with the osmclip GeoJSON
  * boundary (`/root/reference/data/src/Dockerfile`, SURVEY §2.1 S12).
  *
  * The PBF container is public: a sequence of [4-byte BE length,
  * BlobHeader, Blob] frames; data blobs are zlib-compressed
  * PrimitiveBlocks holding delta-coded DenseNodes and Ways
  * (fileformat.proto / osmformat.proto wire format). This is a
  * from-scratch protobuf WIRE reader — varint/zigzag/length-delimited —
  * so no codec dependency is needed.
  *
  * Scale design: blobs are independent units (like parquet row groups).
  * The driver walks only the frame headers to index blob byte-ranges
  * (O(#blobs) seeks, no payload read), then blob decode runs
  * DISTRIBUTED — each task opens the file, seeks its blob, inflates and
  * decodes locally. Nodes never transit the driver; a national extract's
  * thousands of blobs spread across the cluster.
  */
object OsmPbf {

  // ------------------------------------------------------------- wire
  /** Minimal protobuf wire reader over a byte array slice. */
  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var x = 0L; var shift = 0
      while ({
        val b = buf(pos); pos += 1
        x |= (b & 0x7fL) << shift; shift += 7
        (b & 0x80) != 0
      }) ()
      x
    }
    def zigzag(): Long = { val v = varint(); (v >>> 1) ^ -(v & 1) }
    /** (fieldNumber, wireType) */
    def tag(): (Int, Int) = { val t = varint(); ((t >>> 3).toInt, (t & 7).toInt) }
    def lenDelim(): (Int, Int) = { val n = varint().toInt; val s = pos; pos += n; (s, n) }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => val n = varint().toInt; pos += n
      case 5 => pos += 4
      case other => throw new IllegalArgumentException(s"wire type $other")
    }
  }

  // ------------------------------------------------------------ model
  final case class PbfNode(id: Long, lat: Double, lon: Double, tags: Map[String, String])
  final case class PbfWay(id: Long, refs: Array[Long], tags: Map[String, String])
  /** Relation members as parallel arrays (the wire layout): type 0=node,
    * 1=way, 2=relation; roles resolved through the string table.
    */
  final case class PbfRelation(
      id: Long,
      memberIds: Array[Long],
      memberTypes: Array[Int],
      memberRoles: Array[String],
      tags: Map[String, String])
  /** One indexed data blob: byte range within the file. */
  final case class BlobRange(offset: Long, length: Int)

  // ---------------------------------------------------------- indexing
  /** Walk frame headers only; return data-blob byte ranges. */
  def indexBlobs(path: String): Seq[BlobRange] = {
    val in = new DataInputStream(new FileInputStream(path))
    val out = ArrayBuffer.empty[BlobRange]
    var offset = 0L
    try {
      while (in.available() >= 4) {
        val hlen = in.readInt()
        val hdr = new Array[Byte](hlen)
        in.readFully(hdr)
        // BlobHeader: 1=type string, 3=datasize
        val r = new Reader(hdr, 0, hlen)
        var typ = ""; var datasize = 0
        while (r.hasMore) r.tag() match {
          case (1, 2) => val (s, n) = r.lenDelim(); typ = new String(hdr, s, n, "UTF-8")
          case (3, 0) => datasize = r.varint().toInt
          case (_, w) => r.skip(w)
        }
        val blobStart = offset + 4 + hlen
        if (typ == "OSMData") out += BlobRange(blobStart, datasize)
        in.skipBytes(datasize)
        offset = blobStart + datasize
      }
    } finally in.close()
    out.toSeq
  }

  /** Inflate one Blob frame to its PrimitiveBlock bytes. */
  private def inflateBlob(blob: Array[Byte]): Array[Byte] = {
    val r = new Reader(blob, 0, blob.length)
    var raw: Array[Byte] = null
    var rawSize = -1
    var zlib: (Int, Int) = null
    while (r.hasMore) r.tag() match {
      case (1, 2) => val (s, n) = r.lenDelim(); raw = java.util.Arrays.copyOfRange(blob, s, s + n)
      case (2, 0) => rawSize = r.varint().toInt
      case (3, 2) => zlib = r.lenDelim()
      case (_, w) => r.skip(w)
    }
    if (raw != null) raw
    else {
      require(zlib != null, "blob has neither raw nor zlib_data")
      val inf = new Inflater()
      inf.setInput(blob, zlib._1, zlib._2)
      val out = new Array[Byte](rawSize)
      var off = 0
      while (off < rawSize && !inf.finished())
        off += inf.inflate(out, off, rawSize - off)
      inf.end()
      out
    }
  }

  /** Decode one PrimitiveBlock → (nodes, ways). */
  private[graft] def decodeBlock(block: Array[Byte]): (Seq[PbfNode], Seq[PbfWay]) = {
    val (n, w, _) = decodeBlockFull(block)
    (n, w)
  }

  /** Decode one PrimitiveBlock → (nodes, ways, relations). */
  private[graft] def decodeBlockFull(
      block: Array[Byte]): (Seq[PbfNode], Seq[PbfWay], Seq[PbfRelation]) = {
    val r = new Reader(block, 0, block.length)
    val strings = ArrayBuffer.empty[String]
    val groups = ArrayBuffer.empty[(Int, Int)]
    var granularity = 100L
    var latOffset = 0L
    var lonOffset = 0L
    while (r.hasMore) r.tag() match {
      case (1, 2) => // StringTable: repeated field 1 bytes
        val (s, n) = r.lenDelim()
        val sr = new Reader(block, s, s + n)
        while (sr.hasMore) sr.tag() match {
          case (1, 2) => val (ss, sn) = sr.lenDelim(); strings += new String(block, ss, sn, "UTF-8")
          case (_, w) => sr.skip(w)
        }
      case (2, 2) => groups += r.lenDelim()
      case (17, 0) => granularity = r.varint()
      case (19, 0) => latOffset = r.varint()
      case (20, 0) => lonOffset = r.varint()
      case (_, w) => r.skip(w)
    }
    val nodes = ArrayBuffer.empty[PbfNode]
    val ways = ArrayBuffer.empty[PbfWay]
    val rels = ArrayBuffer.empty[PbfRelation]
    def coord(offsetNano: Long, units: Long): Double =
      1e-9 * (offsetNano + granularity * units)
    groups.foreach { case (gs, gn) =>
      val gr = new Reader(block, gs, gs + gn)
      while (gr.hasMore) gr.tag() match {
        case (2, 2) => // DenseNodes
          val (ds, dn) = gr.lenDelim()
          val dr = new Reader(block, ds, ds + dn)
          var ids, lats, lons = Array.emptyLongArray
          var kv = Array.emptyIntArray
          while (dr.hasMore) dr.tag() match {
            case (1, 2) => ids = packedZigzag(block, dr)
            case (8, 2) => lats = packedZigzag(block, dr)
            case (9, 2) => lons = packedZigzag(block, dr)
            case (10, 2) => kv = packedVarint(block, dr).map(_.toInt)
            case (_, w) => dr.skip(w)
          }
          var id = 0L; var la = 0L; var lo = 0L; var ki = 0
          var i = 0
          while (i < ids.length) {
            id += ids(i); la += lats(i); lo += lons(i)
            val tags = Map.newBuilder[String, String]
            while (ki < kv.length && kv(ki) != 0) {
              tags += strings(kv(ki)) -> strings(kv(ki + 1)); ki += 2
            }
            ki += 1 // the 0 delimiter
            nodes += PbfNode(id, coord(latOffset, la), coord(lonOffset, lo), tags.result())
            i += 1
          }
        case (3, 2) => // Way
          val (ws, wn) = gr.lenDelim()
          val wr = new Reader(block, ws, ws + wn)
          var id = 0L
          var keys, vals = Array.emptyLongArray
          var refs = Array.emptyLongArray
          while (wr.hasMore) wr.tag() match {
            case (1, 0) => id = wr.varint()
            case (2, 2) => keys = packedVarint(block, wr)
            case (3, 2) => vals = packedVarint(block, wr)
            case (8, 2) => refs = packedZigzag(block, wr)
            case (_, w) => wr.skip(w)
          }
          var acc = 0L
          val abs = refs.map { d => acc += d; acc }
          val tags = keys.zip(vals)
            .map { case (k, v) => strings(k.toInt) -> strings(v.toInt) }.toMap
          ways += PbfWay(id, abs, tags)
        case (4, 2) => // Relation
          val (rs, rn) = gr.lenDelim()
          val rr = new Reader(block, rs, rs + rn)
          var id = 0L
          var keys, vals, roles, types = Array.emptyLongArray
          var memids = Array.emptyLongArray
          while (rr.hasMore) rr.tag() match {
            case (1, 0) => id = rr.varint()
            case (2, 2) => keys = packedVarint(block, rr)
            case (3, 2) => vals = packedVarint(block, rr)
            case (8, 2) => roles = packedVarint(block, rr)
            case (9, 2) => memids = packedZigzag(block, rr)
            case (10, 2) => types = packedVarint(block, rr)
            case (_, w) => rr.skip(w)
          }
          var acc = 0L
          val abs = memids.map { d => acc += d; acc }
          val tags = keys.zip(vals)
            .map { case (k, v) => strings(k.toInt) -> strings(v.toInt) }.toMap
          rels += PbfRelation(id, abs, types.map(_.toInt),
            roles.map(r => strings(r.toInt)), tags)
        case (_, w) => gr.skip(w)
      }
    }
    (nodes.toSeq, ways.toSeq, rels.toSeq)
  }

  private def packedZigzag(buf: Array[Byte], r: Reader): Array[Long] = {
    val (s, n) = r.lenDelim()
    val pr = new Reader(buf, s, s + n)
    val out = ArrayBuffer.empty[Long]
    while (pr.hasMore) out += pr.zigzag()
    out.toArray
  }

  private def packedVarint(buf: Array[Byte], r: Reader): Array[Long] = {
    val (s, n) = r.lenDelim()
    val pr = new Reader(buf, s, s + n)
    val out = ArrayBuffer.empty[Long]
    while (pr.hasMore) out += pr.varint()
    out.toArray
  }

  // ----------------------------------------------------- distributed read
  /** Nodes DataFrame: (id, lat, lon, tags). Blob decode runs in tasks —
    * the driver only ships (offset, length) pairs.
    */
  def nodes(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    blobDs(spark, path).flatMap(b => decodeBlock(inflateBlob(b))._1).toDF()
  }

  /** Ways DataFrame: (id, refs, tags). */
  def ways(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    blobDs(spark, path).flatMap(b => decodeBlock(inflateBlob(b))._2).toDF()
  }

  /** Relations DataFrame: (id, memberIds, memberTypes, memberRoles,
    * tags) — the carrier of turn restrictions, route and boundary
    * memberships.
    */
  def relations(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    blobDs(spark, path).flatMap(b => decodeBlockFull(inflateBlob(b))._3).toDF()
  }

  private def blobDs(spark: SparkSession, path: String) = {
    import spark.implicits._
    val ranges = indexBlobs(path)
    spark.createDataset(ranges)
      .repartition(math.min(ranges.size, spark.sparkContext.defaultParallelism).max(1))
      .map { br =>
        val raf = new java.io.RandomAccessFile(path, "r")
        try {
          raf.seek(br.offset)
          val buf = new Array[Byte](br.length)
          raf.readFully(buf)
          buf
        } finally raf.close()
      }
  }

  // --------------------------------------------------------------- clip
  /** `osmium extract`-style clip: keep nodes inside the boundary and ways
    * that retain ≥1 kept node (the "simple" extract strategy). Node
    * membership is the distributed even-odd test; the way filter is a
    * semi-join on the exploded ref list — no geometry ever reaches the
    * driver and nothing shuffles except (way_id, ref) pairs.
    */
  def clip(spark: SparkSession, path: String, boundaryWkt: String): (DataFrame, DataFrame) = {
    val boundary = Geometry.parseWkt(boundaryWkt) // parse once, ship the rings
    val insideU = udf((lon: Double, lat: Double) => boundary.contains(lon, lat))
    val keptNodes = nodes(spark, path).filter(insideU(col("lon"), col("lat")))
    val w = ways(spark, path)
    // explode refs → EQUI semi-joins (hash-partitionable both hops; an
    // array_contains join condition would plan a nested loop)
    val keptWayIds = w.select(col("id").as("wid"), explode(col("refs")).as("id"))
      .join(keptNodes.select("id"), Seq("id"), "left_semi")
      .select(col("wid").as("id")).distinct()
    (keptNodes, w.join(keptWayIds, Seq("id"), "left_semi"))
  }

  // -------------------------------------------------------------- write
  /** Build a valid single-block pbf (DenseNodes + Ways, zlib) — fixture
    * tooling mirroring [[Shapefile.writeZip]]: lets specs and oracle
    * queries construct real files whose decode output is recomputable.
    */
  def writePbf(
      path: String,
      nodes: Seq[PbfNode],
      ways: Seq[PbfWay],
      relations: Seq[PbfRelation] = Seq.empty): Unit = {
    val strings = ArrayBuffer[String]("") // index 0 must be the empty string
    def strId(s: String): Int = {
      val i = strings.indexOf(s)
      if (i >= 0) i else { strings += s; strings.length - 1 }
    }
    val granularity = 100L

    def msg(b: ByteArrayOutputStream => Unit): Array[Byte] = {
      val o = new ByteArrayOutputStream(); b(o); o.toByteArray
    }
    def wVarint(o: ByteArrayOutputStream, vIn: Long): Unit = {
      var v = vIn
      while ((v & ~0x7fL) != 0) { o.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      o.write(v.toInt)
    }
    def wTag(o: ByteArrayOutputStream, field: Int, wire: Int): Unit =
      wVarint(o, (field.toLong << 3) | wire)
    def wBytes(o: ByteArrayOutputStream, field: Int, b: Array[Byte]): Unit = {
      wTag(o, field, 2); wVarint(o, b.length); o.write(b)
    }
    def zz(v: Long): Long = (v << 1) ^ (v >> 63)
    def packed(vs: Seq[Long]): Array[Byte] = msg(o => vs.foreach(wVarint(o, _)))

    // resolve tag strings first so the string table is complete
    val nodeKv = nodes.map(n => n.tags.flatMap { case (k, v) => Seq(strId(k), strId(v)) }.toSeq)
    val wayKv = ways.map(w => (w.tags.keys.map(strId(_)).toSeq, w.tags.values.map(strId(_)).toSeq))

    val dense = msg { o =>
      val ids = nodes.map(_.id)
      val lats = nodes.map(n => math.round(n.lat * 1e9) / granularity)
      val lons = nodes.map(n => math.round(n.lon * 1e9) / granularity)
      def deltas(vs: Seq[Long]) = vs.zip(0L +: vs.init).map { case (a, b) => zz(a - b) }
      wBytes(o, 1, packed(deltas(ids)))
      wBytes(o, 8, packed(deltas(lats)))
      wBytes(o, 9, packed(deltas(lons)))
      wBytes(o, 10, packed(nodeKv.flatMap(kv => kv.map(_.toLong) :+ 0L)))
    }
    val wayMsgs = ways.zip(wayKv).map { case (w, (ks, vs)) =>
      msg { o =>
        wTag(o, 1, 0); wVarint(o, w.id)
        wBytes(o, 2, packed(ks.map(_.toLong)))
        wBytes(o, 3, packed(vs.map(_.toLong)))
        wBytes(o, 8, packed(w.refs.zip(0L +: w.refs.init).map { case (a, b) => zz(a - b) }))
      }
    }
    val relKv = relations.map(r =>
      (r.tags.keys.map(strId(_)).toSeq, r.tags.values.map(strId(_)).toSeq,
        r.memberRoles.map(strId(_)).toSeq))
    val relMsgs = relations.zip(relKv).map { case (rel, (ks, vs, roles)) =>
      msg { o =>
        wTag(o, 1, 0); wVarint(o, rel.id)
        wBytes(o, 2, packed(ks.map(_.toLong)))
        wBytes(o, 3, packed(vs.map(_.toLong)))
        wBytes(o, 8, packed(roles.map(_.toLong)))
        wBytes(o, 9, packed(rel.memberIds.zip(0L +: rel.memberIds.init)
          .map { case (a, b) => zz(a - b) }))
        wBytes(o, 10, packed(rel.memberTypes.map(_.toLong)))
      }
    }
    val stringTable = msg(o => strings.foreach(s => wBytes(o, 1, s.getBytes("UTF-8"))))
    val group = msg { o =>
      wBytes(o, 2, dense)
      wayMsgs.foreach(wm => wBytes(o, 3, wm))
      relMsgs.foreach(rm => wBytes(o, 4, rm))
    }
    val block = msg { o =>
      wBytes(o, 1, stringTable)
      wBytes(o, 2, group)
      wTag(o, 17, 0); wVarint(o, granularity)
    }

    val deflater = new Deflater()
    deflater.setInput(block); deflater.finish()
    val zout = new ByteArrayOutputStream()
    val zbuf = new Array[Byte](8192)
    while (!deflater.finished()) zout.write(zbuf, 0, deflater.deflate(zbuf))
    deflater.end()
    val blob = msg { o =>
      wTag(o, 2, 0); wVarint(o, block.length)
      wBytes(o, 3, zout.toByteArray)
    }
    def header(typ: String, datasize: Int): Array[Byte] = msg { o =>
      wBytes(o, 1, typ.getBytes("UTF-8"))
      wTag(o, 3, 0); wVarint(o, datasize)
    }
    // minimal OSMHeader blob (raw, empty HeaderBlock) for container validity
    val headerBlob = msg { o => wBytes(o, 1, Array.empty[Byte]); wTag(o, 2, 0); wVarint(o, 0) }

    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    val out = new DataOutputStream(new FileOutputStream(path))
    try {
      val h1 = header("OSMHeader", headerBlob.length)
      out.writeInt(h1.length); out.write(h1); out.write(headerBlob)
      val h2 = header("OSMData", blob.length)
      out.writeInt(h2.length); out.write(h2); out.write(blob)
    } finally out.close()
  }
}
