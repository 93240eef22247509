package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.sources.HttpFetch
import java.net.InetSocketAddress
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** S6 HTTP file fetch against a local mock (fetch_cb.py:43-50 semantics:
  * streamed chunks to a file, raise on HTTP error).
  */
class HttpFetchSpec extends AnyFunSuite {

  private def withMock[T](routes: Map[String, (Int, Array[Byte])])(f: String => T): T = {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val (code, body) = routes.getOrElse(ex.getRequestURI.getPath, (404, Array.empty[Byte]))
        ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
        if (body.nonEmpty) ex.getResponseBody.write(body)
        ex.close()
      }
    })
    server.start()
    try f(s"http://localhost:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("fetch streams bytes to the dest file with a correct streaming md5") {
    // binary payload (not valid UTF-8) larger than one 8 KiB chunk
    val payload = Array.tabulate[Byte](50000)(i => ((i * 31 + 7) % 256).toByte)
    val expectMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(payload).map("%02x".format(_)).mkString
    withMock(Map("/tiger/cb_2020_us_state_500k.zip" -> (200, payload))) { base =>
      val dest = "/tmp/graft_fetch_spec/state.zip"
      val got = HttpFetch.fetchToFile(s"$base/tiger/cb_2020_us_state_500k.zip", dest)
      assert(got.bytes == payload.length)
      assert(got.md5 == expectMd5)
      assert(Files.readAllBytes(Paths.get(dest)).sameElements(payload))
      // no .part left behind
      assert(!Files.exists(Paths.get(dest + ".part")))
    }
  }

  test("non-2xx raises and leaves no partial file") {
    withMock(Map.empty) { base =>
      val dest = "/tmp/graft_fetch_spec/missing.zip"
      Files.deleteIfExists(Paths.get(dest))
      val e = intercept[java.io.IOException] {
        HttpFetch.fetchToFile(s"$base/nope.zip", dest)
      }
      assert(e.getMessage.contains("404"))
      assert(!Files.exists(Paths.get(dest)) && !Files.exists(Paths.get(dest + ".part")))
    }
  }

  test("refetch overwrites an existing dest atomically") {
    val v1 = "old contents".getBytes("UTF-8")
    val v2 = "new contents, longer than before".getBytes("UTF-8")
    val dest = "/tmp/graft_fetch_spec/replace.bin"
    withMock(Map("/f" -> (200, v1))) { base => HttpFetch.fetchToFile(s"$base/f", dest) }
    withMock(Map("/f" -> (200, v2))) { base =>
      val got = HttpFetch.fetchToFile(s"$base/f", dest)
      assert(got.bytes == v2.length)
      assert(Files.readAllBytes(Paths.get(dest)).sameElements(v2))
    }
  }

  test("fetched zip feeds the shapefile reader (the fetch_cb composition)") {
    val zipSrc = "/tmp/graft_fetch_spec/src_state.zip"
    graft.sources.Shapefile.writeZip(zipSrc, "state",
      Seq(graft.sources.Shapefile.Field("GEOID20", 'C', 2, 0)),
      Seq((Seq("55"), graft.geo.Geometry.parseWkt(
        graft.geo.Geometry.rectWkt(-92, 42, -86, 47)))))
    val bytes = Files.readAllBytes(Paths.get(zipSrc))
    withMock(Map("/cb.zip" -> (200, bytes))) { base =>
      val dest = "/tmp/graft_fetch_spec/fetched_state.zip"
      HttpFetch.fetchToFile(s"$base/cb.zip", dest)
      val df = graft.sources.Shapefile.loadZip(SparkTestSession.spark, dest)
      val rows = df.select("geoid", "wkt").collect()
      assert(rows.length == 1 && rows.head.getString(0) == "55")
      assert(rows.head.getString(1).startsWith("POLYGON"))
    }
  }
}
