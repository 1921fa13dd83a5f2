package graft

import graft.connect.RateLimitedClient
import graft.connect.RateLimitedClient.{Config, Response, Transport}
import scala.collection.mutable.ArrayBuffer

class ConnectSpec extends SparkSpec {

  private def ok(body: String, headers: Map[String, String] = Map.empty,
      url: String = "https://x.test/f.csv") =
    Response(200, headers, body.getBytes("UTF-8"), url)

  test("retries on 5xx with exponential backoff, succeeds within budget") {
    var calls = 0
    val sleeps = ArrayBuffer.empty[Long]
    val t = new Transport {
      def get(url: String): Response = {
        calls += 1
        if (calls < 3) Response(503, Map.empty, Array.empty, url) else ok("done")
      }
    }
    val c = new RateLimitedClient(t, Config(requestsPerSecond = 1e6), sleeps.append)
    val r = c.get("https://x.test/a")
    assert(r.status == 200 && calls == 3)
    // backoff sleeps: 1s then 2s (throttle sleeps are sub-ms at 1e6 rps)
    assert(sleeps.filter(_ >= 1000).toSeq == Seq(1000L, 2000L))
  }

  test("gives up after maxRetries+1 attempts") {
    var calls = 0
    val t = new Transport {
      def get(url: String): Response = { calls += 1; Response(500, Map.empty, Array.empty, url) }
    }
    val c = new RateLimitedClient(t, Config(requestsPerSecond = 1e6), _ => ())
    intercept[RuntimeException](c.get("https://x.test/b"))
    assert(calls == 4)
  }

  test("throttle paces requests at the configured rate") {
    val sleeps = ArrayBuffer.empty[Long]
    val t = new Transport { def get(url: String): Response = ok("x") }
    val c = new RateLimitedClient(t, Config(requestsPerSecond = 10), sleeps.append)
    c.get("u1"); c.get("u2"); c.get("u3")
    // second and third calls must wait (the fake sleeper never advances the
    // clock, so the scheduled slots drift 100ms apart: 100 then 200)
    assert(sleeps.size == 2 && sleeps.forall(_ > 0), sleeps.toSeq)
  }

  test("atomic download resolves filename from content-disposition and caps size") {
    val dir = java.nio.file.Files.createTempDirectory("graftdl")
    val t = new Transport {
      def get(url: String): Response =
        ok("a,b\n1,2\n", Map("Content-Disposition" -> "attachment; filename=\"data.csv\"",
          "Content-Type" -> "text/csv"))
    }
    val c = new RateLimitedClient(t, Config(requestsPerSecond = 1e6), _ => ())
    val p = c.downloadFile("https://x.test/dl", dir).get
    assert(p.getFileName.toString == "data.csv")
    assert(new String(java.nio.file.Files.readAllBytes(p)) == "a,b\n1,2\n")
    assert(c.downloadFile("https://x.test/dl", dir, maxBytes = 3).isEmpty)
    // no temp debris left behind
    val leftovers = java.nio.file.Files.list(dir).toArray.map(_.toString)
      .filter(_.contains(".part-"))
    assert(leftovers.isEmpty)
  }

  test("server-controlled filenames cannot escape the destination directory") {
    import RateLimitedClient._
    assert(resolveFilename(Some("attachment; filename=\"../../etc/passwd\""),
      "https://x/y") == "passwd")
    assert(resolveFilename(Some("attachment; filename=\"..\\..\\boot.ini\""),
      "https://x/y") == "boot.ini")
    assert(resolveFilename(Some("attachment; filename=\"...\""), "https://x/y") == "download")
    val dir = java.nio.file.Files.createTempDirectory("graftsafe")
    val t = new Transport {
      def get(url: String): Response =
        ok("x", Map("Content-Disposition" -> "attachment; filename=\"../escape.txt\""))
    }
    val c = new RateLimitedClient(t, Config(requestsPerSecond = 1e6), _ => ())
    val p = c.downloadFile("https://x.test/dl", dir).get
    assert(p.getParent == dir, s"wrote outside destDir: $p")
  }

  test("filename resolution: RFC-5987 beats plain beats URL; extension from content type") {
    import RateLimitedClient._
    assert(resolveFilename(Some("attachment; filename*=UTF-8''r%C3%A9port.pdf"),
      "https://x/y.bin") == "réport.pdf")
    assert(resolveFilename(Some("attachment; filename=\"a.csv\""), "https://x/y.bin") == "a.csv")
    assert(resolveFilename(None, "https://x/path/file.json?v=1") == "file.json")
    assert(extensionForContentType("text/csv; charset=utf-8") == Some("csv"))
    assert(extensionForContentType("application/geo+json") == Some("geojson"))
    assert(extensionForContentType("application/x-custom+zip") == Some("zip"))
    assert(extensionForContentType("text/tab-separated-values") == Some("tab-separated-values"))
  }
}
