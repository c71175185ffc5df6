package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ChunkSentencesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def chunks(text: String, maxTokens: Int): Seq[(Long, String, Long)] =
    TextOps.chunkSentences(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", maxTokens)
      .orderBy("chunk_id")
      .select($"chunk_id", $"chunk_text", $"chunk_tokens")
      .as[(Long, String, Long)].collect().toSeq

  test("sentences keep their punctuation and split on .!? + space") {
    val got = Seq(Tuple1("One two. Three four! Five six? seven"))
      .toDF("text")
      .select(TextOps.sentences($"text").as("s")).as[Seq[String]].head()
    assert(got == Seq("one two.", "three four!", "five six?", "seven"))
  }

  test("greedy fill packs whole sentences up to maxTokens") {
    // sentences of 3, 3, 2, 4 tokens; maxTokens = 6
    val got = chunks("a b one. c d two. e three. f g h four.", 6)
    assert(got == Seq(
      (0L, "a b one. c d two.", 6L),
      (1L, "e three. f g h four.", 6L)))
  }

  test("a sentence never splits; an oversized sentence gets its own chunk") {
    val got = chunks("tiny. one two three four five six seven. small again.", 5)
    assert(got.map(_._2) == Seq(
      "tiny.",
      "one two three four five six seven.",
      "small again."))
    assert(got.map(_._3) == Seq(1L, 7L, 2L))
  }

  test("short and empty docs still yield exactly one chunk") {
    assert(chunks("just one sentence here", 100) ==
      Seq((0L, "just one sentence here", 4L)))
    assert(chunks("", 10) == Seq((0L, "", 0L)))
  }

  test("no boundary token is lost or duplicated: chunk tokens re-concatenate to the doc") {
    val text = "alpha beta gamma. delta epsilon! zeta eta theta iota? kappa. " +
      "lambda mu nu xi omicron pi. rho sigma."
    for (m <- Seq(3, 5, 8, 50)) {
      val got = chunks(text, m)
      val rebuilt = got.map(_._2).filter(_.nonEmpty).mkString(" ")
      val want = text.toLowerCase.trim.replaceAll("\\s+", " ")
      assert(rebuilt == want, s"maxTokens=$m")
      // chunk ids are dense from 0
      assert(got.map(_._1) == got.indices.map(_.toLong))
      // a chunk over the cap must be a single (oversized) sentence
      got.foreach { case (_, txt, n) =>
        if (n > m) assert(!txt.matches(".*[.!?] .*"), s"maxTokens=$m chunk=$txt")
      }
    }
  }

  test("multiple docs chunk independently") {
    val df = Seq((1L, "a b. c d. e f."), (2L, "x y z w. q r."))
      .toDF("doc_id", "text")
    val got = TextOps.chunkSentences(df, "doc_id", "text", 4)
      .orderBy("doc_id", "chunk_id")
      .select($"doc_id", $"chunk_id", $"chunk_text").as[(Long, Long, String)]
      .collect().toSeq
    assert(got == Seq(
      (1L, 0L, "a b. c d."), (1L, 1L, "e f."),
      (2L, 0L, "x y z w."), (2L, 1L, "q r.")))
  }
}
