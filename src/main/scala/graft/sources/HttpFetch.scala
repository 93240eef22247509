package graft.sources

import java.io.IOException
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest
import java.time.Duration

/** S6: HTTP file fetch — the reference's streamed artifact download
  * (`fetch_cb.py:43-50`: `requests.get(stream=True)` → 8 KiB chunks →
  * temp file → shapefile load). One fetch is one bounded artifact (a
  * TIGER zip, an OSM extract); the driver streams it to local disk and
  * hands the PATH to a distributed reader ([[Shapefile.loadZip]]) — file
  * bytes never transit the JVM heap whole or a Spark shuffle.
  *
  * Streaming MD5 comes for free on the way through (the reference
  * md5-audits fetched inputs, `utils.py:46-52`) so callers can verify
  * against a manifest without a second pass over the file.
  */
object HttpFetch {

  final case class Fetched(path: Path, bytes: Long, md5: String)

  private lazy val client: HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(10))
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()

  /** Stream `url` to `dest` (parents created; atomic rename from a
    * `.part` temp so a failed fetch never leaves a plausible-looking
    * partial file). Non-2xx → IOException, like `raise_for_status()`.
    */
  def fetchToFile(url: String, dest: String, timeoutSec: Int = 300): Fetched = {
    val destPath = Paths.get(dest)
    if (destPath.getParent != null) Files.createDirectories(destPath.getParent)
    val part = destPath.resolveSibling(destPath.getFileName.toString + ".part")

    val resp =
      try client.send(
        HttpRequest.newBuilder(URI.create(url))
          .timeout(Duration.ofSeconds(timeoutSec)).GET().build(),
        HttpResponse.BodyHandlers.ofInputStream())
      catch { case e: Exception =>
        throw new IOException(s"fetch transport: ${e.getMessage}")
      }
    if (resp.statusCode() / 100 != 2) {
      resp.body().close()
      throw new IOException(s"fetch http ${resp.statusCode()} for $url")
    }

    val md = MessageDigest.getInstance("MD5")
    val in = resp.body()
    var total = 0L
    try {
      val out = Files.newOutputStream(part)
      try {
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) {
          if (n > 0) { out.write(buf, 0, n); md.update(buf, 0, n); total += n }
          n = in.read(buf)
        }
      } finally out.close()
    } finally in.close()

    Files.move(part, destPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    Fetched(destPath, total, md.digest().map("%02x".format(_)).mkString)
  }
}
