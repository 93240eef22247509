package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** S5: Census API block-population source — the reference's
  * `fetch_blockpop` (/root/reference/data/src/fetch_blockpop.py:31-50):
  * GET `{base}/{year}/dec/pl?get=P1_001N&for=block:*&in=state:SS...`,
  * response is a JSON array-of-arrays whose first row is the header
  * `[popvar, state, county, tract, block]` and whose data rows are all
  * strings; population becomes int32, the zero-padded FIPS components
  * stay strings, and the `state` column is dropped (it lives as the
  * Hive partition key of the blockpop tree, fetch_blockpop.py:46-47).
  *
  * One fetch is one state-year (≤ a few hundred k rows) — a driver-side
  * request → `createDataFrame`, the same shape as the reference; the
  * distributed work happens downstream when blockpop joins block
  * centroids. Wire parity is tested against a local mock server
  * (CensusSpec), like OsrmSpec does for the routing backend.
  */
final class CensusClient(baseUrl: String, apiKey: Option[String] = None) {

  private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  /** Decennial PL 94-171 total population per block for one state. */
  def blockpop(spark: SparkSession, year: String, state: String): DataFrame = {
    val popVar = if (year == "2010") "P001001" else "P1_001N"
    val url = s"$baseUrl/$year/dec/pl?get=$popVar&for=block:*" +
      s"&in=state:$state&in=county:*&in=tract:*" +
      apiKey.map(k => s"&key=$k").getOrElse("")
    val resp =
      try client.send(
        HttpRequest.newBuilder(URI.create(url)).timeout(Duration.ofSeconds(60))
          .GET().build(),
        HttpResponse.BodyHandlers.ofString())
      catch { case e: Exception =>
        throw new java.io.IOException(s"census transport: ${e.getMessage}")
      }
    if (resp.statusCode() != 200)
      throw new java.io.IOException(s"census http ${resp.statusCode()}")
    val body = resp.body()
    if (body.contains("Invalid Key"))
      throw new IllegalArgumentException("Invalid Census API key provided")

    val rows = CensusClient.parseRows(body)
    require(rows.nonEmpty && rows.head == Seq(popVar, "state", "county", "tract", "block"),
      s"unexpected census header: ${rows.headOption.getOrElse(Nil).mkString(",")}")
    val schema = StructType(Seq(
      StructField("population", IntegerType),
      StructField("county", StringType),
      StructField("tract", StringType),
      StructField("block", StringType)))
    val data = rows.tail.map { r =>
      Row(r.head.toInt, r(2), r(3), r(4)) // drop r(1) = state partition key
    }
    spark.createDataFrame(data.asJava, schema)
  }
}

object CensusClient {
  /** Parse a JSON array of arrays of strings/numbers/nulls (the census
    * response shape). Dependency-free recursive scan with string-escape
    * handling; nulls become empty strings.
    */
  private[graft] def parseRows(body: String): Seq[Seq[String]] = {
    val rows = Seq.newBuilder[Seq[String]]
    var row: scala.collection.mutable.ArrayBuffer[String] = null
    val tok = new StringBuilder
    var tokenLive = false
    def flush(): Unit = {
      if (tokenLive && row != null) row += tok.result()
      tok.clear(); tokenLive = false
    }
    var depth = 0
    var i = 0
    while (i < body.length) {
      body.charAt(i) match {
        case '"' => // quoted string with escapes
          tokenLive = true
          i += 1
          while (i < body.length && body.charAt(i) != '"') {
            if (body.charAt(i) == '\\' && i + 1 < body.length) {
              tok += (body.charAt(i + 1) match {
                case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
                case c => c
              })
              i += 2
            } else { tok += body.charAt(i); i += 1 }
          }
        case '[' =>
          depth += 1
          if (depth == 2) row = scala.collection.mutable.ArrayBuffer.empty[String]
        case ']' =>
          if (depth == 2) { flush(); rows += row.toSeq; row = null }
          depth -= 1
        case ',' => flush()
        case 'n' if body.startsWith("null", i) => // bare null cell
          tokenLive = true; i += 3
        case c if !c.isWhitespace => tok += c; tokenLive = true
        case _ =>
      }
      i += 1
    }
    rows.result()
  }
}
