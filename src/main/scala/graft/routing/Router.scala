package graft.routing

/** A point fed to the routing matrix operator.
  * Mirrors the reference's origin/destination frames after projection —
  * id, lon, lat (/root/reference/data/src/utils/times.py:310-313,337-345).
  */
final case class RoutePoint(id: String, lon: Double, lat: Double)

/** One OD pair result; duration is None for unroutable pairs — the rows
  * that the reference splits out into `missing_pairs`
  * (/root/reference/data/src/calculate_times.py:71-79).
  */
final case class TimeRecord(
    origin_id: String,
    destination_id: String,
    duration_sec: Option[Double])

/** Raised by a [[Router]] when a whole OD block cannot be routed; the
  * matrix operator reacts with quadtree subdivision
  * (/root/reference/data/src/utils/times.py:485-586).
  */
final class RoutingFailure(msg: String) extends RuntimeException(msg)

/** The pluggable routing backend — the reference's OSRM `/table` HTTP call
  * (/root/reference/data/src/utils/times.py:456-462) behind a trait so the
  * engine can run with an embedded deterministic implementation in tests
  * and an HTTP client in production.
  *
  * `table` must either return the full duration matrix
  * (durations(i)(j) = seconds from origins(i) to dests(j)) or throw
  * [[RoutingFailure]] for the whole block.
  */
trait Router extends Serializable {
  def table(origins: IndexedSeq[RoutePoint], dests: IndexedSeq[RoutePoint]): Array[Array[Double]]
}

/** Deterministic synthetic router (FIXTURES.md §B10): duration is
  * Manhattan distance in degrees × 111320 m/deg ÷ speed m/s. Designated
  * "island" points are unroutable: any block containing one fails whole,
  * exercising the quadtree fallback; the nulls only emerge once recursion
  * isolates the island at 1×1.
  *
  * The arithmetic is chosen to be bit-reproducible in ANSI SQL
  * (same IEEE ops in the same order), so the whole operator is
  * oracle-checkable end to end.
  */
final class SyntheticRouter(
    speedMps: Double,
    originIsland: RoutePoint => Boolean = _ => false,
    destIsland: RoutePoint => Boolean = _ => false)
  extends Router {

  override def table(
      origins: IndexedSeq[RoutePoint],
      dests: IndexedSeq[RoutePoint]): Array[Array[Double]] = {
    if (origins.exists(originIsland) || dests.exists(destIsland))
      throw new RoutingFailure(s"unroutable block ${origins.size}x${dests.size}")
    val out = new Array[Array[Double]](origins.size)
    var i = 0
    while (i < origins.size) {
      val o = origins(i)
      val row = new Array[Double](dests.size)
      var j = 0
      while (j < dests.size) {
        val d = dests(j)
        row(j) = (math.abs(o.lon - d.lon) + math.abs(o.lat - d.lat)) * 111320.0 / speedMps
        j += 1
      }
      out(i) = row
      i += 1
    }
    out
  }
}
