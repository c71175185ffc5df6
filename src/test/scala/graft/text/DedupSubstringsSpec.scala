package graft.text

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Exact substring dedup (Lee et al. ACL'22 re-expressed distributed):
  * hand-computed cut shapes, the verbatim-passthrough contract, the
  * corpus stats row, and a brute-force property check of the
  * mark/cover/rebuild pipeline against an independent in-memory
  * re-implementation. */
class DedupSubstringsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], l: Int): Map[Long, String] =
    TextOps.dedupSubstrings(docs.toDF("doc_id", "text"), "doc_id", "text", l)
      .as[(Long, String)].collect().toMap

  private val fixture = Seq(
    1L -> "a b c d e x",                    // first occurrence — untouched
    2L -> "p q a b c d e r",                // copies doc 1's span at pos 2
    3L -> "m n o z m n o",                  // within-doc repeat
    4L -> "u v",                            // too short for any window
    5L -> "",                               // empty
    6L -> "a b c d e x",                    // whole doc duplicated
    7L -> "Hello   WORLD unique1 unique2")  // no dup: verbatim, unnormalized

  test("cross-doc span cut at first-occurrence rule; within-doc repeat; full-doc dup empties") {
    val got = run(fixture, 3)
    assert(got(1L) == "a b c d e x")      // earlier copy keeps everything
    assert(got(2L) == "p q r")            // the shared 5-token span cut
    assert(got(3L) == "m n o z")          // second in-doc "m n o" cut
    assert(got(6L) == "")                 // later full copy empties
  }

  test("untouched docs keep their text VERBATIM (no normalization), short/empty pass through") {
    val got = run(fixture, 3)
    assert(got(4L) == "u v")
    assert(got(5L) == "")
    assert(got(7L) == "Hello   WORLD unique1 unique2")
  }

  test("no duplicated window anywhere: the whole corpus is a no-op") {
    val docs = Seq(1L -> "one two three four", 2L -> "five six seven eight")
    assert(run(docs, 3) == docs.toMap)
  }

  test("stats row: docs/changed/tokens/removed/marked all hand-checked") {
    val row = TextOps.substringDedupStats(
        fixture.toDF("doc_id", "text"), "doc_id", "text", 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // tokens_total counts normalized tokens; "" normalizes to [""] = 1
    assert(row == Seq((7L, 3L, 34L, 14L, 8L)))
  }

  test("stats on a dup-free corpus: zero changed/removed/marked") {
    val docs = Seq(1L -> "one two three four").toDF("doc_id", "text")
    val row = TextOps.substringDedupStats(docs, "doc_id", "text", 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(row == Seq((1L, 0L, 4L, 0L, 0L)))
  }

  test("layout invariance: a repartitioned corpus cuts identically") {
    val df = fixture.toDF("doc_id", "text").repartition(7)
    val got = TextOps.dedupSubstrings(df, "doc_id", "text", 3)
      .as[(Long, String)].collect().toMap
    assert(got == run(fixture, 3))
  }

  test("minTokens < 2 refused") {
    val df = fixture.toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextOps.dedupSubstrings(df, "doc_id", "text", 1).collect()
    }
    assert(e.getMessage.contains("minTokens"))
  }

  /** Independent brute-force re-implementation of the semantics: mark
    * every L-gram occurrence that is not the (id, pos)-first for its
    * gram, cover [p, p+L) per mark, rebuild from uncovered tokens. */
  private def bruteForce(docs: Seq[(Long, String)], l: Int): Map[Long, String] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.trim.split("\\s+", -1).toSeq
    }.toMap
    val occ = scala.collection.mutable.Map[String, List[(Long, Int)]]()
    for ((id, ts) <- toks.toSeq.sortBy(_._1); p <- 0 to ts.length - l)
      occ(ts.slice(p, p + l).mkString(" ")) =
        occ.getOrElse(ts.slice(p, p + l).mkString(" "), Nil) :+ ((id, p))
    val marked = occ.values.flatMap(_.sortBy(identity).drop(1)).toSet
    docs.map { case (id, orig) =>
      val ts = toks(id)
      val marks = marked.collect { case (i, p) if i == id => p }
      if (marks.isEmpty) id -> orig
      else id -> ts.zipWithIndex.collect {
        case (tok, j) if !marks.exists(p => p <= j && j < p + l) => tok
      }.mkString(" ")
    }.toMap
  }

  test("property: pipeline output equals the brute-force semantics on random dup-heavy corpora") {
    val vocab = Vector("aa", "bb", "cc", "dd")
    val genDoc = Gen.chooseNum(0, 15).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    for (round <- 0 until 3) {
      val docs = Gen.listOfN(20, genDoc).sample.get.zipWithIndex
        .map { case (t, i) => ((round * 100 + i).toLong, t) }
      assert(run(docs, 3) == bruteForce(docs, 3), s"round $round: $docs")
    }
  }
}
