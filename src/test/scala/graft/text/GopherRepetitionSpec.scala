package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class GopherRepetitionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def flags(rows: (Long, String)*) =
    TextOps.gopherRepetitionFlags(
        rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

  test("duplicate line fraction: repeats beyond first occurrence count") {
    val r = flags(1L -> "a b\nc d\na b")(1L)
    // lines [a b, c d, a b]: 1 of 3 is a repeat; 3 repeated chars over
    // the FULL 11-char document (paper normalization incl. separators)
    assert(r.getAs[Double]("dup_line_frac") == 0.3333)
    assert(r.getAs[Double]("dup_line_char_frac") == 0.2727)
    // single paragraph (no blank line) — nothing to repeat
    assert(r.getAs[Double]("dup_para_frac") == 0.0)
    assert(r.getAs[Double]("dup_para_char_frac") == 0.0)
  }

  test("duplicate paragraphs split on blank lines; blanks never count") {
    val r = flags(1L -> "x\n\n\nx")(1L)
    assert(r.getAs[Double]("dup_para_frac") == 0.5)
    assert(r.getAs[Double]("dup_line_frac") == 0.5)
  }

  test("top n-gram char fraction: most repeated 2-gram, space-inclusive") {
    val r = flags(1L -> "the cat the cat the cat")(1L)
    // 2-grams: "the cat" x3 (7 chars -> mass 21), "cat the" x2 (mass 14);
    // best 21 over the full 23-char document
    assert(r.getAs[Double]("top_2gram_char_frac") == 0.913)
    // the two 5-grams are distinct — no duplicate mass
    assert(r.getAs[Double]("dup_5gram_char_frac") == 0.0)
    assert(!r.getAs[Boolean]("keep"))
  }

  test("duplicate n-gram mass is non-overlapping (skip-n scan, <= 1)") {
    val r = flags(1L -> "a b c d e a b c d e a b c d e")(1L)
    // period-5 token loop, 11 5-grams of 9 chars each: positions 1-5 are
    // new, position 6 repeats (+9 chars, skip to 11), position 11
    // repeats (+9, done) — 18 chars over the 29-char document, NOT the
    // 30-char every-overlap mass the paper's thresholds never meant
    assert(r.getAs[Double]("dup_5gram_char_frac") == 0.6207)
    // "a b" x3, 3 chars -> mass 9 over 29
    assert(r.getAs[Double]("top_2gram_char_frac") == 0.3103)
    assert(!r.getAs[Boolean]("keep"))
  }

  test("singleton most-frequent n-gram is not repetition") {
    // every 2-gram distinct: top mass must be 0, not max(1 * len)
    val r = flags(1L -> "alpha beta gamma delta")(1L)
    assert(r.getAs[Double]("top_2gram_char_frac") == 0.0)
    assert(r.getAs[Boolean]("keep"))
  }

  test("null text behaves as empty: zero stats, keep") {
    val rows = Seq((1L, null: String), (2L, "some regular text here"))
    val r = TextOps.gopherRepetitionFlags(
        rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Boolean]("keep"))
    assert(r(1L).getAs[Double]("dup_line_frac") == 0.0)
    assert(r(1L).getAs[Double]("top_2gram_char_frac") == 0.0)
    assert(r(2L).getAs[Boolean]("keep"))
  }

  test("clean and degenerate docs keep: all-distinct text, empty, one word") {
    val m = flags(
      1L -> "one two three four five six seven",
      2L -> "",
      3L -> "hello")
    Seq(1L, 2L, 3L).foreach { id =>
      val r = m(id)
      assert(r.getAs[Boolean]("keep"), s"doc $id should pass")
      assert(r.getAs[Double]("dup_line_frac") == 0.0)
      assert(r.getAs[Double]("top_4gram_char_frac") == 0.0)
      assert(r.getAs[Double]("dup_10gram_char_frac") == 0.0)
    }
  }
}
