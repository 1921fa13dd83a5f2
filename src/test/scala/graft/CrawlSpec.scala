package graft

import graft.connect.{CrawlDriver, FeedCrawler, RateLimitedClient}
import graft.connect.RateLimitedClient.{Config, Response, Transport}

class CrawlSpec extends SparkSpec {

  test("batchCount ceil-divides like the reference") {
    assert(CrawlDriver.batchCount(0, 100) == 0)
    assert(CrawlDriver.batchCount(100, 100) == 1)
    assert(CrawlDriver.batchCount(101, 100) == 2)
    assert(CrawlDriver.batchCount(250, 100) == 3)
  }

  test("fetchBatches fans out over the range; skipExisting anti-joins the sink") {
    import spark.implicits._
    val fetched = CrawlDriver.fetchBatches(spark, 3, b =>
      Seq(CrawlDriver.Fetched(s"doc_${b}_0", s"payload $b 0"),
        CrawlDriver.Fetched(s"doc_${b}_1", s"payload $b 1")))
    assert(fetched.count() == 6)
    val existing = Seq("doc_0_0", "doc_2_1").toDF("key")
    val fresh = CrawlDriver.skipExisting(fetched, existing)
    assert(fresh.count() == 4)
    val keys = fresh.select("key").collect().map(_.getString(0)).toSet
    assert(!keys.contains("doc_0_0") && !keys.contains("doc_2_1"))
  }

  private def page(n: Int, withNext: Boolean) = {
    val next = if (withNext)
      s"""<link rel="next" href="https://feed.test/page${n + 1}"/>""" else ""
    s"""<feed xmlns="http://www.w3.org/2005/Atom" xmlns:ukm="http://x/ukm">
       |  $next
       |  <entry>
       |    <id>urn:item$n</id>
       |    <title>Item $n</title>
       |    <updated>2025-0$n-01T00:00:00Z</updated>
       |    <published>2025-0$n-01T00:00:00Z</published>
       |    <summary>Summary $n</summary>
       |    <ukm:ISBN Value="isbn-$n"/>
       |    <ukm:Year Value="202$n"/>
       |    <ukm:Number Value="$n"/>
       |    <link type="application/xhtml+xml" href="https://feed.test/content$n"/>
       |  </entry>
       |</feed>""".stripMargin
  }

  test("feed crawl follows rel=next chain, extracts ukm attrs and content link") {
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    val t = new Transport {
      def get(url: String): Response = {
        calls += url
        val n = url.last.asDigit
        Response(200, Map.empty, page(n, withNext = n < 3).getBytes("UTF-8"), url)
      }
    }
    val client = new RateLimitedClient(t, Config(requestsPerSecond = 1e6), _ => ())
    val entries = FeedCrawler.crawl(client, "https://feed.test/page1")
    assert(calls.toSeq == Seq("https://feed.test/page1", "https://feed.test/page2",
      "https://feed.test/page3"))
    assert(entries.map(_.title) == Seq("Item 1", "Item 2", "Item 3"))
    assert(entries.head.isbn == "isbn-1")
    assert(entries.head.contentLink == "https://feed.test/content1")
  }

  test("unparseable feed page ends the chain instead of failing") {
    val t = new Transport {
      def get(url: String): Response = Response(200, Map.empty, "garbage<".getBytes, url)
    }
    val client = new RateLimitedClient(t, Config(requestsPerSecond = 1e6), _ => ())
    assert(FeedCrawler.crawl(client, "https://feed.test/x").isEmpty)
  }
}
