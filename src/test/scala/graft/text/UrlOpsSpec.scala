package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** URL canonicalization rules, registrable-domain extraction, and the
  * per-domain dedup stats. */
class UrlOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(UrlOps.canonicalizeUrl(col("url")).as("c"))
      .as[String].collect().toSeq

  test("lowercases scheme and host, strips www/userinfo/fragment") {
    assert(canon("HTTPS://WWW.Example.COM/Path#frag") ==
      Seq("https://example.com/Path"))
    assert(canon("http://user:pw@Example.com/a") ==
      Seq("http://example.com/a"))
  }

  test("path case is preserved, trailing slashes collapse, empty path becomes /") {
    assert(canon("http://a.com/X/", "http://a.com/X", "http://a.com",
                 "http://a.com///") ==
      Seq("http://a.com/X", "http://a.com/X", "http://a.com/",
          "http://a.com/"))
  }

  test("default ports drop, explicit non-default ports stay") {
    assert(canon("https://a.com:443/x", "http://a.com:80/x",
                 "http://a.com:8080/x", "https://a.com:80/x") ==
      Seq("https://a.com/x", "http://a.com/x",
          "http://a.com:8080/x", "https://a.com:80/x"))
  }

  test("query params: tracking stripped, empties dropped, rest sorted") {
    assert(canon("http://a.com/p?utm_source=x&b=2&a=1&fbclid=z&gclid=1&ref=h") ==
      Seq("http://a.com/p?a=1&b=2"))
    assert(canon("http://a.com/p?b=2&&a=1") ==
      Seq("http://a.com/p?a=1&b=2"))
    // all params tracking -> no query at all
    assert(canon("http://a.com/p?utm_medium=m") == Seq("http://a.com/p"))
    // utm prefix must not over-match a real param
    assert(canon("http://a.com/p?utmost=1") == Seq("http://a.com/p?utmost=1"))
  }

  test("scheme-less strings pass through unchanged") {
    assert(canon("not a url", "example.com/x") ==
      Seq("not a url", "example.com/x"))
  }

  test("registrableDomain handles two-level suffixes, subdomains, bare hosts") {
    val got = Seq("news.bbc.co.uk", "www.example.com", "a.b.c.example.org",
                  "example.co.uk", "localhost", "co.uk")
      .toDF("h").select(UrlOps.registrableDomain(col("h")).as("d"))
      .as[String].collect().toSeq
    assert(got == Seq("bbc.co.uk", "example.com", "example.org",
                      "example.co.uk", "localhost", "co.uk"))
  }

  test("urlDedupStats counts canonical collapse per registrable domain") {
    val df = Seq(
      "http://www.a.com/x?utm_source=1",
      "http://a.com/x/",
      "http://a.com/x",
      "http://a.com/y",
      "https://b.co.uk/only").toDF("url")
    val got = UrlOps.urlDedupStats(df, "url")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("a.com") == (("a.com", 4L, 2L, 0.5)))
    assert(got("b.co.uk") == (("b.co.uk", 1L, 1L, 0.0)))
  }
}
