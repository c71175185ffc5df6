package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Per-source corpus datasheet: hand-checked on a tiny corpus. */
class DataCardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("perSource composes volume, dup, pii, readability and language mode") {
    val df = Seq(
      (1L, "he ran. she ran.", "en", "web"),
      (2L, "he ran. she ran.", "en", "web"),       // exact dup of 1
      (3L, "mail me at a@b.com now!", "en", "web"),
      (4L, "hola amigo.", "es", "web"),
      (5L, "clean single doc.", "en", "books"))
      .toDF("doc_id", "text", "lang", "source")
    val got = DataCard.perSource(df, "doc_id", "text", "lang", "source")
      .collect().map(r => r.getString(0) -> r).toMap
    val web = got("web")
    assert(web.getLong(1) == 4L)                    // n_docs
    assert(web.getLong(2) == 4 + 4 + 5 + 2)         // n_tokens
    assert(web.getDouble(4) == 0.25)                // dup_ratio: 1 of 4
    assert(web.getDouble(5) == 0.25)                // pii: one email / 4 docs
    assert(web.getString(7) == "en" &&
      web.getDouble(8) == 0.75)                     // top lang share
    val books = got("books")
    assert(books.getLong(1) == 1L && books.getDouble(4) == 0.0 &&
      books.getDouble(5) == 0.0 && books.getDouble(8) == 1.0)
  }

  test("language-mode tie breaks to the larger language string") {
    val df = Seq(
      (1L, "a b.", "en", "s"), (2L, "c d.", "fr", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val got = DataCard.perSource(df, "doc_id", "text", "lang", "source")
      .collect().head
    assert(got.getString(7) == "fr" && got.getDouble(8) == 0.5)
  }
}
