package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class UnigramSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def enc(text: String, model: Unigram.Model): Seq[(Long, Long, String)] =
    Unigram.encode(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", model)
      .select($"widx", $"pidx", $"piece").as[(Long, Long, String)]
      .collect().sortBy(r => (r._1, r._2)).toSeq

  /** Driver-side Viterbi reference with the same tie-break order. */
  private def refViterbi(word: String,
                         vocab: Seq[(String, Double)]): Seq[String] = {
    val L = word.length
    val best = Array.fill[Option[(Double, List[String])]](L + 1)(None)
    best(0) = Some((0.0, Nil))
    for (j <- 1 to L) {
      val cands = vocab.flatMap { case (p, lp) =>
        if (p.length <= j && word.substring(j - p.length, j) == p)
          best(j - p.length).map { case (s, ps) => (s + lp, ps :+ p, p) }
        else None
      }
      if (cands.nonEmpty)
        best(j) = Some {
          val b = cands.minBy { case (s, _, p) => (-s, -p.length, p) }
          (b._1, b._2)
        }
    }
    best(L).map(_._2).getOrElse(List("[UNK]"))
  }

  test("Viterbi beats greedy: global optimum picks the shorter first piece") {
    val m = Unigram.Model(Seq(
      ("ab", -1.0), ("c", -5.0), ("a", -2.0), ("bc", -1.0), ("b", -3.0)))
    // greedy longest-from-left would take ab(-1) + c(-5) = -6;
    // Viterbi takes a(-2) + bc(-1) = -3
    assert(enc("abc", m).map(_._3) == Seq("a", "bc"))
  }

  test("distributed DP matches the driver-side Viterbi reference") {
    val rng = new scala.util.Random(17)
    val alphabet = "abcd"
    val vocab = alphabet.map(c => (c.toString, -2.0 - rng.nextDouble())) ++
      Seq("ab", "bcd", "cd", "da", "abc", "bb").map(p =>
        (p, -1.0 - 2.0 * rng.nextDouble()))
    val words = (1 to 25).map(_ =>
      (1 to (3 + rng.nextInt(8))).map(_ => alphabet(rng.nextInt(4))).mkString)
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val m = Unigram.Model(vocab)
    val got = Unigram.encode(docs, "doc_id", "text", m)
      .select($"widx", $"pidx", $"piece").as[(Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    words.zipWithIndex.foreach { case (w, i) =>
      assert(got(i + 1L) == refViterbi(w, vocab), s"word '$w'")
    }
  }

  test("uncovered word emits a single [UNK]") {
    val m = Unigram.Model(Seq(("x", -1.0)))
    assert(enc("xq x", m).filter(_._1 == 1).map(_._3) == Seq("[UNK]"))
    assert(enc("xq x", m).filter(_._1 == 2).map(_._3) == Seq("x"))
  }

  test("corpus-trained model reassembles every word with zero [UNK]") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "the dog jumps the fox"))
      .toDF("doc_id", "text")
    val m = Unigram.train(docs, "text", topWords = 4)
    val out = Unigram.encode(docs, "doc_id", "text", m)
    assert(out.where($"piece" === "[UNK]").count() == 0)
    val rebuilt = out.groupBy($"doc_id", $"widx")
      .agg(concat_ws("", collect_list($"piece")).as("word"))
    val words = docs.select($"doc_id",
        posexplode(TextOps.tokens($"text")).as(Seq("wi", "w")))
      .select($"doc_id", ($"wi" + 1).cast("long").as("widx"), $"w")
    assert(rebuilt.join(words, Seq("doc_id", "widx"))
      .where($"word" =!= $"w").count() == 0)
    // 'the' is the most frequent word: its aggregate probability beats
    // any character path, so it rides as one piece
    val theDocs = words.where($"w" === "the")
    val thePieces = out.join(theDocs, Seq("doc_id", "widx"))
      .groupBy($"doc_id", $"widx").agg(count(lit(1)).as("n"))
    assert(thePieces.select(max($"n")).as[Long].head() == 1L)
  }

  test("train scores are a normalized distribution over words + alphabet") {
    val docs = Seq((1L, "aa aa b")).toDF("doc_id", "text")
    val m = Unigram.train(docs, "text", topWords = 1)
    val byPiece = m.pieces.toMap
    // top word 'aa' (c=2); chars a (c=4), b (c=1); total 7
    assert(math.abs(byPiece("aa") - math.log(2.0 / 7)) < 1e-12)
    assert(math.abs(byPiece("a") - math.log(4.0 / 7)) < 1e-12)
    assert(math.abs(byPiece("b") - math.log(1.0 / 7)) < 1e-12)
  }
}
