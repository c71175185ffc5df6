package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Zipf fit + n-gram novelty audits. */
class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("zipfFit recovers a planted exact power law") {
    // word w_r repeated round(1000 / r) times -> ln(n) = ln(1000) - ln(r)
    val docs = (1 to 20).flatMap { r =>
      Seq.fill(math.round(1000.0 / r).toInt)(s"w$r")
    }.grouped(50).map(_.mkString(" ")).toSeq.toDF("text")
    val got = CorpusStats.zipfFit(docs, "text", topK = 20)
      .as[(Long, Long, Long, Double, Double, Double)].collect().head
    assert(got._1 == 20L && got._3 == 20L)
    assert(math.abs(got._4 - (-1.0)) < 0.01, s"slope ${got._4}")
    assert(got._6 > 0.999, s"r2 ${got._6}")
  }

  test("zipfFit: a flat (template) distribution fits slope ~ 0") {
    val docs = (1 to 10).flatMap(r => Seq.fill(50)(s"w$r"))
      .grouped(25).map(_.mkString(" ")).toSeq.toDF("text")
    val got = CorpusStats.zipfFit(docs, "text", topK = 10)
      .as[(Long, Long, Long, Double, Double, Double)].collect().head
    assert(got._4 == 0.0)
  }

  test("collocations: a true collocation outranks frequent-but-independent pairs") {
    // "new york": both words exist ONLY in the pair. "the end": same
    // pair count, but "the" occurs 3x per doc -> PMI lower by ln(3).
    val docs = (1 to 20)
      .map(i => s"the f${i % 5} new york the g${i % 5} the end")
      .toDF("text")
    val got = CorpusStats.collocations(docs, "text", minCount = 5, topK = 5)
      .as[(String, Long, Double)].collect()
    assert(got.head._1 == "new york" && got.head._2 == 20L)
    val byName = got.map(r => r._1 -> r._3).toMap
    assert(byName("new york") > byName("the end"))
    assert(math.abs((byName("new york") - byName("the end")) - math.log(3.0)) < 1e-4)
    // sub-minCount pairs are filtered out entirely
    assert(!got.exists(_._1.startsWith("f")))
  }

  test("ngramNovelty separates unique text from corpus-shared phrasing") {
    val shared = "the quick brown fox jumps"
    val df = Seq(
      (1L, shared),                          // all grams shared with 2
      (2L, s"$shared over the lazy dog"),
      (3L, "completely novel words here indeed"),
      (4L, "ab"))                            // < 3 tokens -> no row
      .toDF("doc_id", "text")
    val got = CorpusStats.ngramNovelty(df, "doc_id", "text", 3)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(!got.contains(4L))
    assert(got(1L)._2 == 3L && got(1L)._4 == 0.0)   // every trigram also in 2
    assert(got(3L)._4 == 1.0)
    // doc 2: 7 grams, 3 shared with doc 1 -> 4/7 novel
    assert(got(2L)._2 == 7L && got(2L)._3 == 4L &&
      got(2L)._4 == 0.5714)
  }
}
