package graft.routing

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** OSRM `/table` HTTP backend — the reference's production router
  * (/root/reference/data/src/utils/times.py:389-483; endpoint shape
  * `/table/v1/{profile}/{lon,lat;...}?sources=...&destinations=...
  * &annotations=duration`).
  *
  * One instance per executor (lazy client); each matrix operator task
  * issues a single request per block, bounded by maxSplit — the same
  * `--max-table-size` envelope the reference runs OSRM with
  * (calculate-times.yaml:178-180). Unroutable pairs arrive as JSON nulls
  * and surface as NaN cells (→ missing_pairs); transport errors and
  * non-Ok codes throw [[RoutingFailure]] → quadtree isolation.
  */
final class OsrmRouter(baseUrl: String, profile: String = "driving") extends Router {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  override def table(
      origins: IndexedSeq[RoutePoint],
      dests: IndexedSeq[RoutePoint]): Array[Array[Double]] = {
    val coords = (origins ++ dests).map(p => s"${p.lon},${p.lat}").mkString(";")
    val sources = origins.indices.mkString(";")
    val destinations = (origins.size until origins.size + dests.size).mkString(";")
    val uri = URI.create(
      s"$baseUrl/table/v1/$profile/$coords?annotations=duration" +
        s"&sources=$sources&destinations=$destinations")
    val resp =
      try client.send(
        HttpRequest.newBuilder(uri).timeout(Duration.ofSeconds(60)).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      catch { case e: Exception => throw new RoutingFailure(s"transport: ${e.getMessage}") }
    if (resp.statusCode() != 200)
      throw new RoutingFailure(s"http ${resp.statusCode()}")
    val body = resp.body()
    if (!body.contains("\"code\":\"Ok\"") && !body.contains("\"code\": \"Ok\""))
      throw new RoutingFailure("osrm code not Ok")
    val m = OsrmRouter.parseDurations(body)
    if (m.length != origins.size || m.exists(_.length != dests.size))
      throw new RoutingFailure(
        s"matrix shape ${m.length}x${m.headOption.map(_.length).getOrElse(0)} " +
          s"!= ${origins.size}x${dests.size}")
    m
  }
}

object OsrmRouter {
  /** Parse the `"durations": [[...],[...]]` field: nested arrays of
    * numbers/nulls. Nulls become NaN. Dependency-free recursive descent
    * (the engine adds no JSON library).
    */
  private[graft] def parseDurations(body: String): Array[Array[Double]] = {
    val key = "\"durations\""
    val at = body.indexOf(key)
    if (at < 0) throw new RoutingFailure("no durations field")
    var i = body.indexOf('[', at)
    if (i < 0) throw new RoutingFailure("malformed durations")
    val rows = Array.newBuilder[Array[Double]]
    var depth = 0
    var row: scala.collection.mutable.ArrayBuffer[Double] = null
    val num = new StringBuilder
    def flushNum(): Unit = {
      if (num.nonEmpty) { row += num.result().toDouble; num.clear() }
    }
    var done = false
    while (!done && i < body.length) {
      body.charAt(i) match {
        case '[' =>
          depth += 1
          if (depth == 2) row = scala.collection.mutable.ArrayBuffer.empty[Double]
        case ']' =>
          if (depth == 2) { flushNum(); rows += row.toArray }
          depth -= 1
          if (depth == 0) done = true
        case ',' => flushNum()
        case 'n' => // "null"
          row += Double.NaN
          i += 3
        case c if c.isDigit || c == '.' || c == '-' || c == 'e' || c == 'E' || c == '+' =>
          num += c
        case _ => // whitespace
      }
      i += 1
    }
    rows.result()
  }
}
