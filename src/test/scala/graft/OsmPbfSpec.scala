package graft

import graft.geo.Geometry
import graft.sources.OsmPbf
import graft.sources.OsmPbf.{PbfNode, PbfWay}
import org.scalatest.funsuite.AnyFunSuite

/** S12 OSM pbf source + clip: the from-scratch protobuf wire reader
  * against files built by our own writer AND against hand-checked
  * delta/zigzag expectations, then the osmium-style boundary clip.
  */
class OsmPbfSpec extends AnyFunSuite {
  import SparkTestSession._

  private def fixtureNodes: Seq[PbfNode] = Seq(
    PbfNode(1001L, 41.88, -87.63, Map("highway" -> "traffic_signals")),
    PbfNode(1002L, 41.8812, -87.6298, Map.empty),
    PbfNode(2001L, 35.0, -100.0, Map("name" -> "far away")),
    PbfNode(1003L, 41.879, -87.6305, Map("amenity" -> "cafe", "name" -> "caffè")))

  private def fixtureWays: Seq[PbfWay] = Seq(
    PbfWay(9001L, Array(1001L, 1002L, 1003L), Map("highway" -> "residential")),
    PbfWay(9002L, Array(2001L, 2001L + 1), Map("highway" -> "primary")))

  test("pbf roundtrip: dense-node delta/zigzag coords, tags, way refs survive") {
    val path = "/tmp/graft_pbf_spec/roundtrip.pbf"
    OsmPbf.writePbf(path, fixtureNodes, fixtureWays)

    val nodes = OsmPbf.nodes(spark, path).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getMap[String, String](3).toMap)).sortBy(_._1)
    assert(nodes.map(_._1).toSeq == Seq(1001L, 1002L, 1003L, 2001L))
    // OSM fixed precision: granularity 100 → 1e-7 degrees, exact here
    val n1 = nodes.find(_._1 == 1001L).get
    assert(math.abs(n1._2 - 41.88) < 1e-9 && math.abs(n1._3 - (-87.63)) < 1e-9)
    assert(n1._4 == Map("highway" -> "traffic_signals"))
    // non-ASCII tag value survives the string table
    assert(nodes.find(_._1 == 1003L).get._4("name") == "caffè")
    assert(nodes.find(_._1 == 1002L).get._4.isEmpty)

    val ways = OsmPbf.ways(spark, path).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq,
        r.getMap[String, String](2).toMap)).sortBy(_._1)
    assert(ways.map(_._1).toSeq == Seq(9001L, 9002L))
    assert(ways.head._2 == Seq(1001L, 1002L, 1003L)) // delta-decoded refs
    assert(ways.head._3 == Map("highway" -> "residential"))
  }

  test("blob index walks headers only and the decode runs distributed") {
    val path = "/tmp/graft_pbf_spec/index.pbf"
    OsmPbf.writePbf(path, fixtureNodes, fixtureWays)
    val ranges = OsmPbf.indexBlobs(path)
    assert(ranges.length == 1) // one OSMData blob; OSMHeader is skipped
    val fileLen = java.nio.file.Files.size(java.nio.file.Paths.get(path))
    assert(ranges.head.offset > 0 && ranges.head.offset + ranges.head.length <= fileLen)
  }

  test("clip keeps inside nodes and ways with >=1 kept node (equi semi-join plan)") {
    val path = "/tmp/graft_pbf_spec/clip.pbf"
    OsmPbf.writePbf(path, fixtureNodes, fixtureWays)
    // Chicago-ish box: keeps the three 41.8x nodes, drops 2001
    val boundary = Geometry.rectWkt(-88.0, 41.0, -87.0, 42.0)
    val (nodes, ways) = OsmPbf.clip(spark, path, boundary)
    assert(nodes.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1001L, 1002L, 1003L))
    assert(ways.select("id").collect().map(_.getLong(0)).toSeq == Seq(9001L))
    // scale shape: the way filter is equi joins, not a nested loop
    val plan = ways.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(1200))
  }

  test("multi-blob file: ranges decode independently (blob = split unit)") {
    // two single-block files concatenated = one file with two data blobs
    val p1 = "/tmp/graft_pbf_spec/part1.pbf"
    val p2 = "/tmp/graft_pbf_spec/part2.pbf"
    val cat = "/tmp/graft_pbf_spec/cat.pbf"
    OsmPbf.writePbf(p1, fixtureNodes.take(2), Seq(fixtureWays.head))
    OsmPbf.writePbf(p2, fixtureNodes.drop(2), Seq(fixtureWays(1)))
    val b1 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p1))
    val b2 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p2))
    val out = java.nio.file.Paths.get(cat)
    java.nio.file.Files.write(out, b1 ++ b2)
    assert(OsmPbf.indexBlobs(cat).length == 2)
    assert(OsmPbf.nodes(spark, cat).count() == 4)
    assert(OsmPbf.ways(spark, cat).count() == 2)
  }
}
