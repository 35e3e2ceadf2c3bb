package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.{Duration, Instant}
import java.time.temporal.ChronoUnit

/** Collection phase: fetch a source snapshot to a local file, with the
  * reference's monthly-staleness protocol
  * (tb_data_collection.py:53-233 fetch, :352-393 DataUpdateScheduler).
  *
  * Driver-side utility by design — collection is one small CSV/JSON
  * download per source, not a distributed job; Spark enters at the
  * read of the landed file. Plain `java.net.http` (JDK built-in), no
  * extra dependencies.
  *
  * `http(s)://` sources are downloaded; anything else (`file://` URI
  * or a plain path) is treated as a local snapshot and copied, so the
  * collect→process→serve lifecycle is runnable offline against a
  * checked-in snapshot — same code path the tests pin.
  */
object Fetch {

  /** Fetch `source` to `dest` (parent dirs created). Returns `dest`. */
  def fetchToFile(source: String, dest: Path, timeoutSec: Int = 60): Path = {
    Option(dest.getParent).foreach(Files.createDirectories(_))
    if (source.startsWith("http://") || source.startsWith("https://")) {
      val client = HttpClient.newBuilder()
        .followRedirects(HttpClient.Redirect.NORMAL)
        .connectTimeout(Duration.ofSeconds(timeoutSec.toLong))
        .build()
      val req = HttpRequest.newBuilder(URI.create(source))
        .timeout(Duration.ofSeconds(timeoutSec.toLong))
        // the WHO extranet rejects default java agents (the reference
        // sends a browser agent for the same reason)
        .header("User-Agent", "Mozilla/5.0")
        .GET().build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
      if (resp.statusCode() / 100 != 2)
        throw new java.io.IOException(s"GET $source -> HTTP ${resp.statusCode()}")
      Files.write(dest, resp.body())
    } else {
      val src = if (source.startsWith("file://")) Paths.get(URI.create(source))
                else Paths.get(source)
      Files.copy(src, dest, StandardCopyOption.REPLACE_EXISTING)
    }
    dest
  }

  /** The 30-day update check (tb_data_collection.py:360-375): update
    * when the marker file is missing, unreadable, or older than
    * `maxAgeDays`. `now` is injectable for tests. */
  def shouldUpdate(lastUpdateFile: Path, maxAgeDays: Int = 30,
                   now: Instant = Instant.now()): Boolean =
    if (!Files.exists(lastUpdateFile)) true
    else
      try {
        val last = Instant.parse(Files.readString(lastUpdateFile).trim)
        ChronoUnit.DAYS.between(last, now) > maxAgeDays
      } catch { case _: Exception => true }

  /** Fetch-if-stale (tb_data_collection.py:377-393 update_data): fetch
    * `source` to `dest` only when [[shouldUpdate]] says so, then stamp
    * the marker. Returns true when a fetch happened. */
  def fetchIfStale(source: String, dest: Path, lastUpdateFile: Path,
                   maxAgeDays: Int = 30, now: Instant = Instant.now()): Boolean = {
    val stale = shouldUpdate(lastUpdateFile, maxAgeDays, now)
    if (stale) {
      fetchToFile(source, dest)
      Option(lastUpdateFile.getParent).foreach(Files.createDirectories(_))
      Files.writeString(lastUpdateFile, now.toString)
    }
    stale
  }
}
