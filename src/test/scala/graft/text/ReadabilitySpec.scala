package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Flesch readability: hand-computed counts and formula values. */
class ReadabilitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("flesch computes word/sentence/syllable counts and both scores") {
    // "the cat sat. it sat there!" -> 6 words, 2 sentences,
    // syllables: the=1 cat=1 sat=1 it=1 sat=1 there=2 -> 7
    val got = Readability.flesch(
      Seq((1L, "The cat sat. It sat there!")).toDF("doc_id", "text"),
      "doc_id", "text")
      .as[(Long, Long, Long, Long, Double, Double)].collect().head
    assert(got._2 == 6L && got._3 == 2L && got._4 == 7L)
    val wps = 6.0 / 2; val spw = 7.0 / 6
    val ease = BigDecimal(206.835 - 1.015 * wps - 84.6 * spw)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val grade = BigDecimal(0.39 * wps + 11.8 * spw - 15.59)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._5 == ease && got._6 == grade)
  }

  test("fragments count one sentence; blank docs score null") {
    val rows = Readability.flesch(
      Seq((1L, "no terminal punctuation here"), (2L, "   "))
        .toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getLong(2) == 1L) // n_sentences floor
    assert(rows(2L).getLong(1) == 0L && rows(2L).isNullAt(4) &&
      rows(2L).isNullAt(5))
  }

  test("monosyllabic short sentences read easy; polysyllabic long ones read hard") {
    val got = Readability.flesch(Seq(
      (1L, "he ran. she ran. we ran."),
      (2L, "extraordinary considerations necessitate unprecedented organizational recalibration immediately"))
      .toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(got(1L) > 90.0, s"easy text scored ${got(1L)}")
    assert(got(2L) < 0.0, s"hard text scored ${got(2L)}")
  }
}
