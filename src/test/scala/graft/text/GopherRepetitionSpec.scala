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
    // lines [a b, c d, a b]: 1 of 3 is a repeat; 3 of 9 chars
    assert(r.getAs[Double]("dup_line_frac") == 0.3333)
    assert(r.getAs[Double]("dup_line_char_frac") == 0.3333)
    // single paragraph (no blank line) — nothing to repeat
    assert(r.getAs[Double]("dup_para_frac") == 0.0)
    assert(r.getAs[Double]("dup_para_char_frac") == 0.0)
  }

  test("duplicate paragraphs split on blank lines; blanks never count") {
    val r = flags(1L -> "x\n\n\nx")(1L)
    assert(r.getAs[Double]("dup_para_frac") == 0.5)
    assert(r.getAs[Double]("dup_line_frac") == 0.5)
  }

  test("top n-gram char fraction: most frequent 2-gram covers all chars") {
    val r = flags(1L -> "the cat the cat the cat")(1L)
    // 2-grams: "the cat" x3, "cat the" x2; best = 3 * 6 chars; total 18
    assert(r.getAs[Double]("top_2gram_char_frac") == 1.0)
    // the two 5-grams are distinct — no duplicate mass
    assert(r.getAs[Double]("dup_5gram_char_frac") == 0.0)
    assert(!r.getAs[Boolean]("keep"))
  }

  test("duplicate n-gram char fraction counts overlap mass (can exceed 1)") {
    val r = flags(1L -> "a b c d e a b c d e a b c d e")(1L)
    // period-5 token loop: 5-gram repeats carry (3-1)*5 + 4*(2-1)*5 = 30
    // chars over 15 total non-space chars
    assert(r.getAs[Double]("dup_5gram_char_frac") == 2.0)
    assert(r.getAs[Double]("top_2gram_char_frac") == 0.4)
    assert(!r.getAs[Boolean]("keep"))
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
