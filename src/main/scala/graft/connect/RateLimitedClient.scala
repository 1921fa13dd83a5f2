package graft.connect

import java.nio.file.{Files, Path, StandardCopyOption}

/** Rate-limited HTTP client service (SURVEY S15;
  * resources/api_client.py:14-287).
  *
  * Contract preserved from the reference:
  *  - token-interval throttle (`sleep(1/rate)` between requests);
  *  - bounded retries with exponential backoff on retryable failures
  *    (urllib3 Retry(total=3, backoff_factor=1, 5xx));
  *  - atomic file download: stream to a temp file in the target dir, then
  *    rename (api_client.py:273-280) — same guarantee as Spark's commit
  *    protocol;
  *  - filename resolution order: RFC-5987 `filename*`, then plain
  *    `filename`, then the final URL path (api_client.py:85-103);
  *  - content-type → extension mapping with text-subtype and `+suffix`
  *    fallbacks (api_client.py:105-187).
  *
  * The transport is injected (`Transport`), so crawlers are testable with a
  * stub and the engine never needs network in CI. On a cluster this class is
  * executor-local state inside `mapPartitions` — per-executor rate limiting,
  * the same budget-splitting the reference gets from per-process clients.
  */
object RateLimitedClient {

  final case class Response(status: Int, headers: Map[String, String],
      body: Array[Byte], finalUrl: String)

  /** Injectable transport: one GET. Production impl wraps
    * java.net.http.HttpClient; tests provide a stub. */
  trait Transport { def get(url: String): Response }

  final case class Config(requestsPerSecond: Double = 10.0, maxRetries: Int = 3,
      backoffSeconds: Double = 1.0)

  /** Content-type → extension map (subset of the reference's ~70 entries,
    * plus its two fallback rules). */
  val ContentTypeExtensions: Map[String, String] = Map(
    "text/csv" -> "csv", "application/json" -> "json",
    "application/pdf" -> "pdf", "text/html" -> "html",
    "application/vnd.ms-excel" -> "xls",
    "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet" -> "xlsx",
    "application/vnd.oasis.opendocument.spreadsheet" -> "ods",
    "application/xml" -> "xml", "text/xml" -> "xml",
    "application/zip" -> "zip", "text/plain" -> "txt",
    "application/geo+json" -> "geojson", "application/rdf+xml" -> "rdf")

  def extensionForContentType(ct: String): Option[String] = {
    if (ct == null || ct.isEmpty) return None
    val base = ct.split(";")(0).trim.toLowerCase
    ContentTypeExtensions.get(base)
      .orElse(base.split("\\+").drop(1).lastOption) // application/x+suffix
      .orElse(if (base.startsWith("text/")) Some(base.stripPrefix("text/")) else None)
  }

  /** Strip any path components from a server-supplied name: both separators
    * and traversal dots — the name must stay INSIDE the destination dir no
    * matter what the server sends. */
  private[connect] def sanitizeFilename(name: String): String = {
    val base = name.replace('\\', '/').split('/').filter(_.nonEmpty).lastOption
      .getOrElse("download")
    val cleaned = base.replaceAll("^\\.+", "")
    if (cleaned.isEmpty) "download" else cleaned
  }

  /** Filename resolution: RFC-5987 filename* > filename > final URL path.
    * The result is always sanitized to a bare file name. */
  def resolveFilename(contentDisposition: Option[String], finalUrl: String): String = {
    val fromStar = contentDisposition.flatMap { cd =>
      "filename\\*=(?:UTF-8''|utf-8'')?\"?([^\";]+)\"?".r
        .findFirstMatchIn(cd).map(m =>
          java.net.URLDecoder.decode(m.group(1), "UTF-8"))
    }
    val fromPlain = contentDisposition.flatMap { cd =>
      "filename=\"?([^\";]+)\"?".r.findFirstMatchIn(cd).map(_.group(1))
    }
    sanitizeFilename(fromStar.orElse(fromPlain).getOrElse {
      val path = finalUrl.split("[?#]")(0)
      path.split("/").lastOption.getOrElse("download")
    })
  }
}

final class RateLimitedClient(transport: RateLimitedClient.Transport,
    config: RateLimitedClient.Config = RateLimitedClient.Config(),
    sleeper: Long => Unit = Thread.sleep) {
  import RateLimitedClient._

  private var lastRequestAt = 0L

  private def throttle(): Unit = synchronized {
    val interval = (1000.0 / config.requestsPerSecond).toLong
    val now = System.currentTimeMillis()
    val wait = lastRequestAt + interval - now
    if (wait > 0) sleeper(wait)
    lastRequestAt = math.max(now, lastRequestAt + interval)
  }

  /** GET with throttle + retry/backoff on 5xx and transport exceptions. */
  def get(url: String): Response = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= config.maxRetries) {
      throttle()
      try {
        val r = transport.get(url)
        if (r.status < 500) return r
        lastErr = new RuntimeException(s"HTTP ${r.status} from $url")
      } catch { case e: Exception => lastErr = e }
      attempt += 1
      if (attempt <= config.maxRetries)
        sleeper((config.backoffSeconds * 1000 * (1L << (attempt - 1))).toLong)
    }
    throw new RuntimeException(
      s"GET $url failed after ${config.maxRetries + 1} attempts", lastErr)
  }

  /** Atomic download: temp file in the destination dir + rename. Returns the
    * final path; None when the response exceeds `maxBytes` (the reference's
    * 25 MB CKAN cap, checked post-download too). */
  def downloadFile(url: String, destDir: Path,
      maxBytes: Long = 25L * 1024 * 1024): Option[Path] = {
    val r = get(url)
    if (r.body.length > maxBytes) return None
    val name = resolveFilename(r.headers.get("Content-Disposition"), r.finalUrl)
    val ext = r.headers.get("Content-Type").flatMap(extensionForContentType)
    val fileName =
      if (name.contains(".") || ext.isEmpty) name else s"$name.${ext.get}"
    Files.createDirectories(destDir)
    val tmp = Files.createTempFile(destDir, ".part-", ".tmp")
    try {
      Files.write(tmp, r.body)
      val target = destDir.resolve(fileName)
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      Some(target)
    } finally Files.deleteIfExists(tmp)
  }
}
