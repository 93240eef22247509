package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.sources.CensusClient
import java.net.InetSocketAddress
import org.scalatest.funsuite.AnyFunSuite

/** S5 census-source wire parity against a local mock speaking the Census
  * API's array-of-arrays JSON (fetch_blockpop.py:31-50 semantics:
  * header row, string cells, int32 population, state column dropped,
  * zero-padded FIPS preserved).
  */
class CensusSpec extends AnyFunSuite {
  import SparkTestSession._

  private def withMock[T](handler: (String, String) => (Int, String))(f: String => T): T = {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val (code, body) = handler(ex.getRequestURI.getPath, ex.getRequestURI.getQuery)
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(code, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try f(s"http://localhost:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("row parser: header + data rows, escapes, bare numbers, nulls") {
    val rows = CensusClient.parseRows(
      """[["P1_001N","state","county","tract","block"],
        |["42","17","031","010100","1000"],
        |["0","17","031","010100","1001"],
        |[null,"17","031","010100","1002"]]""".stripMargin)
    assert(rows.length == 4)
    assert(rows.head == Seq("P1_001N", "state", "county", "tract", "block"))
    assert(rows(1) == Seq("42", "17", "031", "010100", "1000"))
    assert(rows(3).head == "")
  }

  test("blockpop: schema + semantics vs the mock (int32 pop, padded FIPS, state dropped)") {
    withMock { (path, query) =>
      assert(path == "/2020/dec/pl", path)
      assert(query.contains("get=P1_001N") && query.contains("for=block:*")
        && query.contains("in=state:17"), query)
      (200,
        """[["P1_001N","state","county","tract","block"],
          |["1234","17","031","010100","1000"],
          |["7","17","043","002900","2005"],
          |["0","17","031","980000","0060"]]""".stripMargin)
    } { base =>
      val s = spark
      val df = new CensusClient(base).blockpop(s, "2020", "17")
      assert(df.schema.map(f => (f.name, f.dataType.simpleString)) ==
        Seq(("population", "int"), ("county", "string"),
          ("tract", "string"), ("block", "string")))
      val rows = df.collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getString(3))).toSet
      assert(rows == Set(
        (1234, "031", "010100", "1000"),
        (7, "043", "002900", "2005"),
        (0, "031", "980000", "0060")))
    }
  }

  test("blockpop: 2010 uses P001001; key is appended when provided") {
    var seenQuery = ""
    withMock { (_, query) =>
      seenQuery = query
      (200, """[["P001001","state","county","tract","block"],["5","06","001","000100","1000"]]""")
    } { base =>
      val df = new CensusClient(base, apiKey = Some("SECRET")).blockpop(spark, "2010", "06")
      assert(df.count() == 1)
      assert(seenQuery.contains("get=P001001") && seenQuery.contains("key=SECRET"))
    }
  }

  test("blockpop composes into the weighted-centroid stage (S5 → A1 integration)") {
    withMock { (_, _) =>
      (200,
        """[["P1_001N","state","county","tract","block"],
          |["10","17","031","010100","1000"],
          |["30","17","031","010100","1001"],
          |["0","17","043","002900","2000"],
          |["0","17","043","002900","2001"]]""".stripMargin)
    } { base =>
      val s = spark
      import s.implicits._
      val bp = new CensusClient(base).blockpop(s, "2020", "17")
      // block centroids arrive from the (shapefile) block frame in the
      // real pipeline; synthesize the join side here
      val coords = Seq(
        ("031", "010100", "1000", 1.0, 10.0),
        ("031", "010100", "1001", 3.0, 14.0),
        ("043", "002900", "2000", 5.0, 20.0),
        ("043", "002900", "2001", 7.0, 28.0)
      ).toDF("county", "tract", "block", "x", "y")
      val blockloc = bp.join(coords, Seq("county", "tract", "block"))
        .select(org.apache.spark.sql.functions.col("county").as("geoid"),
          $"x", $"y", $"population")
      val got = graft.etl.Centroids.cenloc(blockloc).collect()
        .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(3)))).toMap
      // weighted county 031: x_wt = (1*10 + 3*30)/40 = 2.5; unweighted x = 2
      assert(got("031") == ((2.0, 2.5)))
      // county 043 has zero total weight → x_wt falls back to plain mean
      assert(got("043") == ((6.0, 6.0)))
    }
  }

  test("blockpop: invalid key and http errors surface as errors, not empty frames") {
    withMock { (_, _) => (200, """Invalid Key provided, see terms""") } { base =>
      intercept[IllegalArgumentException](new CensusClient(base).blockpop(spark, "2020", "17"))
    }
    withMock { (_, _) => (500, "oops") } { base =>
      intercept[java.io.IOException](new CensusClient(base).blockpop(spark, "2020", "17"))
    }
  }
}
