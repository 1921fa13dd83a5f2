package graft.connect

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._
import graft.functions.TimeFunctions

/** CKAN catalog crawl binding (SURVEY S13 — data.gov.uk;
  * assets/data_gov_uk/assets.py:17-200). The generic fan-out/skip machinery
  * is [[CrawlDriver]]; this object pins the CKAN-specific surface:
  * facet-based category discovery, the package_search query grammar
  * (public-licence fq filter, metadata_created sort, rows/start paging),
  * and the package→per-resource metadata record mapping, including the
  * environment-category source override, the resource-name title override,
  * and the 25 MB size-cap skip.
  */
object CkanCrawler {

  private val mapper = new ObjectMapper()

  /** assets.py:31 — licence ids accepted as public. */
  val PublicLicences: Seq[String] = Seq("ogl", "uk-ogl", "OGL-UK-3.0", "cc-by",
    "other-pd", "other-open", "odc-pddl", "odc-odbl", "odc-by", "cc-nc",
    "other-nc", "cc-zero")

  /** assets.py:32 — fq clause form. */
  val publicLicenseFilter: String =
    "license_id:(" + PublicLicences.mkString(" OR ") + ")"

  val MaxFileSizeBytes: Long = 25L * 1024 * 1024
  val ResultsPerCategory = 100

  /** assets.py:104-109 — package_search params for one category. */
  def searchParams(category: String): Map[String, String] = Map(
    "fq" -> s"theme-primary:$category AND $publicLicenseFilter",
    "sort" -> "metadata_created desc",
    "rows" -> ResultsPerCategory.toString,
    "start" -> "0")

  /** assets.py:100-102 — environment datasets carry their own source. */
  def sourceFor(category: String): String =
    if (category == "environment") "environment.data.gov.uk" else "data.gov.uk"

  /** Category names from the facet-discovery response
    * (result.facets.theme-primary keys; assets.py:56-64). */
  def parseCategories(json: String): Seq[String] = {
    val root = try mapper.readTree(json) catch { case _: Exception => return Seq.empty }
    val facets = root.path("result").path("facets").path("theme-primary")
    if (!facets.isObject) Seq.empty
    else facets.fieldNames().asScala.toSeq
  }

  /** One downloadable resource with its merged package metadata
    * (assets.py:122-175 mapping). */
  final case class CkanResource(
      resourceId: String, url: String, format: String,
      title: String, collectionTitle: String, description: String,
      source: String, creator: String, license: String, language: String,
      category: String, tags: Seq[String], datasetUrl: String,
      publicTime: String, firstPublishTime: String, sizeBytes: Option[Long])

  /** Flatten a package_search response into per-resource records for one
    * category. Resources without a URL or above the size cap are dropped
    * (the reference logs and skips both). */
  def resourceRecords(json: String, category: String): Seq[CkanResource] = {
    val root = try mapper.readTree(json) catch { case _: Exception => return Seq.empty }
    val results = root.path("result").path("results")
    if (!results.isArray) return Seq.empty
    results.asScala.toSeq.flatMap(pkg => packageResources(pkg, category))
  }

  private def str(n: JsonNode, f: String): String = {
    val v = n.path(f)
    if (v.isMissingNode || v.isNull) "" else v.asText("")
  }
  private def firstNonEmpty(xs: String*): String = xs.find(_.nonEmpty).getOrElse("")

  private def packageResources(pkg: JsonNode, category: String): Seq[CkanResource] = {
    val pkgId = firstNonEmpty(str(pkg, "id"), str(pkg, "name"), str(pkg, "title"), "package")
    val org = pkg.path("organization")
    val tags = pkg.path("tags").asScala.map(t => str(t, "name")).filter(_.nonEmpty).toSeq
    val allTags = (tags :+ category).distinct
    val title = firstNonEmpty(str(pkg, "title"), str(pkg, "name"), pkgId)
    val description = str(pkg, "notes")
    val license = firstNonEmpty(str(pkg, "license_id"), str(pkg, "license_title"),
      str(pkg, "licence-custom"))
    val language = firstNonEmpty(str(pkg, "locale"), "en")
    val publicTime = TimeFunctions.parseToIso8601Utc(str(pkg, "metadata_modified"))
      .filter(_.nonEmpty).getOrElse("")
    val firstPublish = TimeFunctions.parseToIso8601Utc(str(pkg, "datafile-date"))
      .filter(_.nonEmpty)
      .orElse(TimeFunctions.parseToIso8601Utc(str(pkg, "created")).filter(_.nonEmpty))
      .getOrElse("")
    pkg.path("resources").asScala.toSeq.zipWithIndex.flatMap { case (res, i) =>
      val resId = firstNonEmpty(str(res, "id"), s"resource_$i")
      val url = firstNonEmpty(str(res, "url"), str(res, "resource_url"))
      val size = Option(str(res, "size")).filter(_.nonEmpty)
        .flatMap(s => scala.util.Try(s.toLong).toOption)
      if (url.isEmpty || size.exists(_ > MaxFileSizeBytes)) None
      else {
        // assets.py:170-173: a named resource takes over the title slot
        val resName = str(res, "name")
        val (outTitle, outCollTitle, outDesc) =
          if (resName.nonEmpty) (resName, title, s"$title. $description")
          else (title, "", description)
        Some(CkanResource(resId, url, str(res, "format"),
          outTitle, outCollTitle, outDesc,
          sourceFor(category), firstNonEmpty(str(org, "title"), str(org, "name")),
          license, language, category, allTags,
          s"https://data.gov.uk/dataset/${str(pkg, "id")}",
          publicTime, firstPublish, size))
      }
    }
  }
}

/** ONS timeseries crawl binding (SURVEY S14 — api.beta.ons.gov.uk;
  * assets/ons_gov_uk/assets.py:26-186): topics → per-topic timeseries
  * search → CSV-generator download URL + sidecar metadata, with the
  * has-csv-AND-has-json skip rule and the ONS-specific safe-name rules.
  */
object OnsCrawler {

  private val mapper = new ObjectMapper()

  val TopicsUrl = "https://api.beta.ons.gov.uk/v1/topics"
  val SearchUrl = "https://api.beta.ons.gov.uk/v1/search"
  val ResourcesPerTopic = 1000

  /** assets.py:78-85 — search params for one topic. */
  def searchParams(topicId: String): Map[String, String] = Map(
    "topics" -> topicId,
    "content_type" -> "timeseries",
    "sort" -> "release_date",
    "limit" -> ResourcesPerTopic.toString,
    "offset" -> "3000")

  /** assets.py:38-46 — URL-decode, '/'→'_', keep [alnum_-], collapse '__',
    * strip '_', cap 200. NOT the generic TextFunctions.safeName. */
  def safeName(uri: String): String = {
    val decoded = percentDecode(uri)
    val cleaned = decoded.replace("/", "_")
    var safe = cleaned.map(c => if (c.isLetterOrDigit || c == '_' || c == '-') c else '_')
    while (safe.contains("__")) safe = safe.replace("__", "_")
    safe = safe.stripPrefix("_").stripSuffix("_")
    safe.take(200)
  }

  /** python urllib.parse.unquote: %xx decode only ('+' stays '+'). */
  private def percentDecode(s: String): String = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
        s.substring(i + 1, i + 3).forall(ch => Character.digit(ch, 16) >= 0)) {
        out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16)); i += 3
      } else { out.write(c.toString.getBytes("UTF-8")); i += 1 }
    }
    new String(out.toByteArray, "UTF-8")
  }

  /** python urllib.parse.quote(uri, safe="") — everything but unreserved
    * [A-Za-z0-9_.~-] percent-encoded. */
  def percentEncodeAll(s: String): String =
    s.getBytes("UTF-8").map { b =>
      val c = (b & 0xFF).toChar
      if (c.isLetterOrDigit && c < 128 || "_.~-".contains(c)) c.toString
      else f"%%${b & 0xFF}%02X"
    }.mkString

  /** assets.py:28,93-95 — CSV generator link for a timeseries uri. */
  def csvGeneratorUrl(uri: String): String =
    s"https://www.ons.gov.uk/generator?format=csv&uri=${percentEncodeAll(uri)}"

  /** assets.py:134-142 — fully downloaded = BOTH sidecar json and csv. */
  def needsDownload(existingFiles: Seq[String], safe: String): Boolean = {
    val mine = existingFiles.filter(_.startsWith(safe + "."))
    val hasJson = mine.exists(_.toLowerCase.endsWith(".json"))
    val hasCsv = mine.exists(_.toLowerCase.endsWith(".csv"))
    !(hasJson && hasCsv)
  }

  /** One timeseries item with its sidecar-metadata fields
    * (assets.py:144-159; the reference writes the licence under the literal
    * key "license:" — a preserved quirk of its metadata dict). */
  final case class OnsTimeseries(uri: String, link: String, title: String,
      description: String, publicTime: String, firstPublishTime: String,
      topics: Seq[String], source: String, openType: String, license: String,
      language: String, format: String, fileName: String)

  /** Parse a /v1/search response's items into metadata records. Items
    * without a uri are dropped (the reference counts them as failures). */
  def timeseriesRecords(json: String): Seq[OnsTimeseries] = {
    val root = try mapper.readTree(json) catch { case _: Exception => return Seq.empty }
    root.path("items").asScala.toSeq.flatMap { item =>
      val uri = item.path("uri").asText("")
      if (uri.isEmpty) None
      else {
        val release = TimeFunctions.parseToIso8601Utc(item.path("release_date").asText(""))
          .filter(_.nonEmpty).getOrElse("")
        val topics = (item.path("keywords") match {
          case a if a.isArray => a.asScala.map(_.asText("")).toSeq
          case _ => item.path("keyword") match {
            case a if a.isArray => a.asScala.map(_.asText("")).toSeq
            case _ => Seq.empty
          }
        }).filter(_.nonEmpty)
        Some(OnsTimeseries(uri, "https://www.ons.gov.uk" + uri,
          item.path("title").asText(""), item.path("summary").asText(""),
          release, release, topics, "ons.gov.uk", "Open Government",
          "Open Government Licence v3.0", "en", "csv",
          safeName(uri) + ".csv"))
      }
    }
  }
}
