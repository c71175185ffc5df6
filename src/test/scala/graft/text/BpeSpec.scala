package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // the Sennrich et al. running example: vocab {low:3, lower:2,
  // newest:5, widest:1} -> pair counts es:6, st? (s,t):6, ...
  private lazy val corpus = Seq(
    (Seq.fill(3)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(5)("newest") ++ Seq("widest")).mkString(" "))
    .toDF("text")

  test("train learns the hand-computed merge sequence with deterministic tie-breaks") {
    val merges = Bpe.train(corpus, "text", numMerges = 3)
    // round 1: (w,e) = 5 (newest) + 2 (lower) = 7, the unique max.
    // round 2: (s,t) = 5 (newest) + 1 (widest) = 6.
    // round 3: tie at 5 between (e,we), (l,o), (n,e), (we,st) ->
    // lexicographic pair-asc picks ("e","we").
    assert(merges == Seq(("w", "e"), ("s", "t"), ("e", "we")))
  }

  test("encode applies merges greedily by rank; zero merges = characters") {
    val merges = Seq(("e", "s"), ("es", "t"), ("e", "w"))
    val got = Seq("newest widest")
      .toDF("text")
      .select(Bpe.encode(TextOps.tokens(col("text")), merges).as("sw"))
      .as[Seq[String]].head()
    assert(got == Seq("n", "ew", "est", "w", "i", "d", "est"))
    val chars = Seq("ab c").toDF("text")
      .select(Bpe.encode(TextOps.tokens(col("text")), Nil).as("sw"))
      .as[Seq[String]].head()
    assert(chars == Seq("a", "b", "c"))
  }

  test("encoding the training corpus with its own merges is stable (re-encode fixpoint)") {
    val merges = Bpe.train(corpus, "text", numMerges = 10)
    val once = corpus
      .select(Bpe.encode(TextOps.tokens(col("text")), merges).as("sw"))
      .as[Seq[String]].head()
    // every emitted subword must be un-mergeable under the same ranks:
    // re-encoding the concatenation of any adjacent pair would merge it,
    // so no adjacent output pair may be a learned merge within one word.
    // Cheap proxy: token count is stable and far below character count
    val n = once.length.toLong
    val charCount = corpus
      .select(Bpe.encode(TextOps.tokens(col("text")), Nil).as("sw"))
      .as[Seq[String]].head().length.toLong
    assert(n < charCount)
    val again = corpus
      .select(Bpe.encode(TextOps.tokens(col("text")), merges).as("sw"))
      .as[Seq[String]].head()
    assert(once == again)
  }

  test("train stops early when no pair repeats") {
    val tiny = Seq("ab").toDF("text")
    val merges = Bpe.train(tiny, "text", numMerges = 100)
    // "ab" has one (a,b) pair with count 1 -> below the repeat floor
    assert(merges.isEmpty)
  }

  test("astral-plane code points stay whole symbols (no surrogate splitting)") {
    // an emoji is one code point in two UTF-16 chars; symbols must be
    // code points or every subword touching it is corrupt
    val emoji = new String(Character.toChars(0x1F600))
    val word = s"a${emoji}b"
    val df = Seq(s"$word $word $word").toDF("text")
    // zero merges: encode must yield exactly the three code points
    val chars = df.select(Bpe.encode(TextOps.tokens(col("text")), Nil).as("sw"))
      .as[Seq[String]].head().take(3)
    assert(chars == Seq("a", emoji, "b"))
    // training sees the emoji as a mergeable unit, not surrogate halves
    val merges = Bpe.train(df, "text", numMerges = 1)
    assert(merges == Seq(("a", emoji)))
    val encoded = df.select(Bpe.encode(TextOps.tokens(col("text")), merges).as("sw"))
      .as[Seq[String]].head().take(2)
    assert(encoded == Seq(s"a$emoji", "b"))
  }

  test("saveMerges/loadMerges round-trips the model artifact in rank order") {
    val merges = Bpe.train(corpus, "text", numMerges = 5)
    val path = java.nio.file.Files.createTempDirectory("graft_bpe_")
      .resolve("merges.txt").toString
    Bpe.saveMerges(merges, path)
    assert(Bpe.loadMerges(path) == merges)
    // empty model round-trips too
    Bpe.saveMerges(Nil, path)
    assert(Bpe.loadMerges(path).isEmpty)
  }

  test("tokenCount under a learned vocab") {
    val merges = Bpe.train(corpus, "text", numMerges = 3)
    val n = Seq("newest").toDF("text")
      .select(Bpe.tokenCount(TextOps.tokens(col("text")), merges).as("n"))
      .as[Long].head()
    assert(n == 3L) // n / ew / est
  }
}
