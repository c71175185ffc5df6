package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class HtmlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def strip(html: String): String =
    Seq(html).toDF("h").select(Html.stripTags($"h")).as[String].head()

  test("stripTags: scripts/styles/comments vanish whole, blocks break, entities decode") {
    val page = """<html><head><title>T</title>
      <script>var a = "<p>not text</p>";</script>
      <style>p { color: red }</style></head>
      <body><h1>Head</h1><!-- skip --><p>one &amp; two &lt;three&gt;</p>
      <div>tail&nbsp;end</div></body></html>"""
    assert(strip(page) == "T\nHead\none & two <three>\ntail end\n")
  }

  test("stripTags: double-encoded entity stays literal, tags in any case") {
    // &amp;lt; is the PAGE saying "&lt;" — must not double-decode to "<"
    assert(strip("<P>x &amp;lt; y</P>") == "\nx &lt; y\n")
    assert(strip("<DIV>a</DIV><BR>b") == "\na\n\nb".replace("\n\n", "\n"))
    // self-closing and attribute-bearing tags break blocks too
    assert(strip("""<p class="x">a</p><br/>b""") == "\na\nb")
  }

  test("linkCount counts anchors case-insensitively, before stripping") {
    val df = Seq("""<a href="/">x</a> <A HREF="/y">y</A> <area>""").toDF("h")
    assert(df.select(Html.linkCount($"h")).as[Long].head() == 2L)
  }

  test("paragraphs: prose kept, link chrome and stubs dropped; mainText agrees") {
    val page = "<h1>Tiny</h1>" +
      "<p>the quick brown fox jumps over a lazy dog and it is glad of that</p>" +
      "<div class=\"nav\"><a href=\"/\">home</a> <a href=\"/l\">login register contact</a></div>"
    val docs = Seq((1L, page)).toDF("doc_id", "html")
    val paras = Html.paragraphs(docs, "doc_id", "html",
        minChars = 30, minStopRatio = 0.1)
      .orderBy("para_idx")
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(paras.length == 3)
    assert(!paras(0)._5)              // "Tiny": too short
    assert(paras(1)._5)               // prose: long + stopword-dense
    assert(paras(1)._4 > 0.3)
    assert(!paras(2)._5 && paras(2)._4 == 0.0) // nav chrome: no stopwords
    val main = docs.select(Html.mainText($"html", 30, 0.1)).as[String].head()
    assert(main == "the quick brown fox jumps over a lazy dog and it is glad of that")
  }

  test("mainText never explodes rows and stays a single projection") {
    val docs = (1L to 50L).map(i => (i, s"<p>doc $i of the corpus and it is prose enough to keep</p>"))
      .toDF("doc_id", "html")
    val out = docs.select($"doc_id", Html.mainText($"html", 10, 0.05).as("m"))
    assert(out.count() == 50)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)   // no shuffle
    assert(!plan.contains("Generate"), plan)   // no explode
  }
}
