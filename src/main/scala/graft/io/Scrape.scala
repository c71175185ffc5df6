package graft.io

/** URL-discovery sources (reference: web_scraping.py:8-85): scrape a
  * statistics publication page for spreadsheet links and map them to
  * logical table numbers.
  *
  * The HTTP fetch is injectable (`Fetcher`) — every reference test mocks
  * the network (tests/test_validation.py:28-32) and the zero-egress build
  * requires the same discipline. A scraper is pure driver logic: pages
  * are single HTML documents, never data.
  */
object Scrape {

  /** url -> page body. Inject a real HTTP client in deployment; tests and
    * the offline build inject canned pages. */
  type Fetcher = String => String

  final case class TableLink(table: String, description: String, url: String)

  /** One scraper per collection (SCRAPERS_MAP parity,
    * web_scraping.py:65-67). */
  trait UrlScraper {
    def collection: String
    def scrape(pageUrl: String, fetch: Fetcher): Map[String, TableLink]
  }

  /** Anchor tags whose href ends in a spreadsheet extension. */
  private val anchorRe =
    """(?is)<a\s[^>]*href="([^"]+\.xlsx?)"[^>]*>(.*?)</a>""".r
  /** "DUKES x.y" style table numbers inside the anchor text
    * (web_scraping.py:45). */
  private val tableNumRe = """(?i)\b([0-9]+(?:\.[0-9]+)+[A-Z]?|[A-Z]\.[0-9]+)\b""".r
  private val tagRe = """<[^>]+>""".r

  /** DUKES-style chapter page scraper: collect spreadsheet anchors,
    * extract the table number from the link text. */
  final class ChapterPageScraper(val collection: String) extends UrlScraper {
    def scrape(pageUrl: String, fetch: Fetcher): Map[String, TableLink] = {
      val body = fetch(pageUrl)
      anchorRe.findAllMatchIn(body).flatMap { m =>
        val href = m.group(1)
        val text = tagRe.replaceAllIn(m.group(2), " ").replaceAll("\\s+", " ").trim
        tableNumRe.findFirstIn(text).map { num =>
          num -> TableLink(num, text, absolutize(pageUrl, href))
        }
      }.toMap
    }
  }

  private def absolutize(pageUrl: String, href: String): String =
    if (href.startsWith("http")) href
    else {
      val base = java.net.URI.create(pageUrl)
      base.resolve(href).toString
    }

  /** Chapter key for a table number (reference: core/utils.py:30-55) —
    * used to group scraped links by publication chapter. Accepts raw table
    * names ("1.2.3") or key form ("dukes_1_2_3"). Numeric tables map to
    * chapter_{first digit}; letter tables follow the published exceptions
    * (annex I/J sit in chapter 1, E.1/F.3/F.4 in 3, F.2 in 4). */
  def tableToChapter(tableNumber: String, collection: String = "dukes"): String = {
    require(tableNumber.nonEmpty, "empty table number")
    val raw =
      if (tableNumber.startsWith(collection + "_"))
        tableNumber.stripPrefix(collection + "_").replace('_', '.')
      else tableNumber
    val first = raw.charAt(0)
    if (first.isDigit) s"chapter_$first"
    else if (first == 'I' || first == 'J') "chapter_1"
    else if (raw == "E.1" || raw == "F.3" || raw == "F.4") "chapter_3"
    else if (raw == "F.2") "chapter_4"
    else throw new IllegalArgumentException(
      s"no chapter mapping for table '$raw'")
  }

  /** Scraper registry keyed by collection. */
  val registry: Map[String, UrlScraper] =
    Seq(new ChapterPageScraper("dukes")).map(s => s.collection -> s).toMap

  def scrapeUrls(collection: String, pageUrl: String,
                 fetch: Fetcher): Map[String, TableLink] =
    registry.getOrElse(collection,
        throw new IllegalArgumentException(s"no scraper for collection '$collection'"))
      .scrape(pageUrl, fetch)
}
