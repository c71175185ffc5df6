package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class WordpieceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def enc(text: String, vocab: Wordpiece.Vocab): Seq[(Long, Long, String)] =
    Wordpiece.encode(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", vocab)
      .select($"widx", $"pidx", $"piece").as[(Long, Long, String)]
      .collect().sortBy(r => (r._1, r._2)).toSeq

  test("the canonical BERT example: unaffable -> un ##aff ##able") {
    val v = Wordpiece.Vocab(
      initials = Seq("un") ++ "unafble".map(_.toString),
      continuations = Seq("aff", "able") ++ "unafble".map(_.toString))
    assert(enc("unaffable", v).map(_._3) == Seq("un", "##aff", "##able"))
  }

  test("greedy longest match wins at every position") {
    val v = Wordpiece.Vocab(
      initials = Seq("a", "ab", "abc"),
      continuations = Seq("c", "cd", "d"))
    // greedy takes abc then ##d, never the shorter ab/a first
    assert(enc("abcd", v).map(_._3) == Seq("abc", "##d"))
  }

  test("a word with an uncovered position becomes a single [UNK]") {
    val v = Wordpiece.Vocab(initials = Seq("x"), continuations = Seq("x"))
    val got = enc("xxq other", v)
    assert(got.filter(_._1 == 1).map(_._3) == Seq("[UNK]"))
    assert(got.filter(_._1 == 2).map(_._3) == Seq("[UNK]"))
  }

  test("corpus-built vocab reassembles every word with zero [UNK]") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "the dog jumps the fox"))
      .toDF("doc_id", "text")
    val vocab = Wordpiece.buildVocab(docs, "text", topWords = 3)
    val out = Wordpiece.encode(docs, "doc_id", "text", vocab)
    assert(out.where($"piece" === "[UNK]").count() == 0)
    // strip ## and re-concatenate pieces per word -> the original word
    val rebuilt = out
      .groupBy($"doc_id", $"widx")
      .agg(concat_ws("", collect_list(
        regexp_replace($"piece", "^##", ""))).as("word"))
    val words = docs.select($"doc_id",
        posexplode(TextOps.tokens($"text")).as(Seq("wi", "w")))
      .select($"doc_id", ($"wi" + 1).cast("long").as("widx"), $"w")
    val mismatch = rebuilt.join(words, Seq("doc_id", "widx"))
      .where($"word" =!= $"w").count()
    assert(mismatch == 0)
    // frequent whole words ride as single pieces
    val thePieces = out.join(words.where($"w" === "the"), Seq("doc_id", "widx"))
      .groupBy($"doc_id", $"widx").agg(count(lit(1)).as("n"))
    assert(thePieces.select(max($"n")).as[Long].head() == 1L)
  }

  test("piece indexes are dense from 1 in scan order") {
    val v = Wordpiece.Vocab(
      initials = Seq("a", "b"), continuations = Seq("a", "b"))
    val got = enc("abab ba", v)
    assert(got == Seq((1L, 1L, "a"), (1L, 2L, "##b"), (1L, 3L, "##a"),
      (1L, 4L, "##b"), (2L, 1L, "b"), (2L, 2L, "##a")))
  }

  test("fertility: hand-computed pieces-per-word per group") {
    // vocab {a, b}: "abab ba" -> 4 + 2 = 6 pieces over 2 words (f=3);
    // "aa" -> 2 pieces over 1 word (f=2)
    val v = Wordpiece.Vocab(
      initials = Seq("a", "b"), continuations = Seq("a", "b"))
    val docs = Seq((1L, "abab ba", "g1"), (2L, "aa", "g2"))
      .toDF("doc_id", "text", "lang")
    val pieces = Wordpiece.encode(docs, "doc_id", "text", v)
    val got = Wordpiece.fertility(pieces, docs, "doc_id", "text", Seq("lang"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("g1") == ((2L, 6L, 3.0)))
    assert(got("g2") == ((1L, 2L, 2.0)))
  }
}
