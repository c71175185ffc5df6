package graft.text

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Property tests for the late-round-6 operators: randomized checks of
  * the algebraic claims behind line dedup, BPE, and the salted join —
  * cases hand-picked fixtures miss. Batched evaluation: each property
  * runs a handful of Spark jobs over locally-generated frames. */
class LateRound6PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val lineAlphabet = Vector("aa", "bb", "cc", "dd", "ee", "")

  test("dedupLines: every distinct non-blank line survives exactly once, order preserved") {
    val genDoc = Gen.listOfN(6, Gen.oneOf(lineAlphabet)).map(_.mkString("\n"))
    val docs = Gen.listOfN(8, genDoc).sample.get.zipWithIndex
      .map { case (d, i) => (i.toLong, d) }
    val df = docs.toDF("doc_id", "text")
    val out = TextOps.dedupLines(df, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    val survivingNonBlank = out.values.flatMap(_.split("\n", -1)).filter(_.nonEmpty).toSeq
    val originalNonBlank = docs.flatMap(_._2.split("\n", -1)).filter(_.nonEmpty).distinct
    // global uniqueness + nothing lost entirely
    assert(survivingNonBlank.sorted == survivingNonBlank.distinct.sorted)
    assert(survivingNonBlank.toSet == originalNonBlank.toSet)
    // each doc's surviving lines are a subsequence of its original lines
    for ((id, orig) <- docs) {
      val kept = out(id).split("\n", -1).filter(_.nonEmpty).toList
      val origL = orig.split("\n", -1).toList
      def isSubseq(a: List[String], b: List[String]): Boolean = a match {
        case Nil => true
        case h :: t => b.dropWhile(_ != h) match {
          case Nil => false
          case _ :: rest => isSubseq(t, rest)
        }
      }
      assert(isSubseq(kept, origL), s"doc $id: $kept not a subsequence of $origL")
    }
  }

  test("BPE encode: subwords concatenate back to the tokens (lossless at every merge count)") {
    val genWord = Gen.listOfN(5, Gen.oneOf("a", "b", "c")).map(_.mkString)
    val corpus = Gen.listOfN(40, genWord).sample.get.mkString(" ")
    val df = Seq(corpus).toDF("text")
    for (nm <- Seq(0, 3, 10)) {
      val merges = Bpe.train(df, "text", numMerges = nm)
      val joined = df.select(
          array_join(Bpe.encode(TextOps.tokens(col("text")), merges), "").as("j"),
          array_join(TextOps.tokens(col("text")), "").as("orig"))
        .as[(String, String)].head()
      assert(joined._1 == joined._2, s"lossy encode at $nm merges")
    }
  }

  test("BPE: more merges never increase the subword count (prefix-priority monotonicity)") {
    val genWord = Gen.listOfN(6, Gen.oneOf("x", "y")).map(_.mkString)
    val corpus = Gen.listOfN(30, genWord).sample.get.mkString(" ")
    val df = Seq(corpus).toDF("text")
    val all = Bpe.train(df, "text", numMerges = 12)
    val counts = (0 to all.length).map { k =>
      df.select(Bpe.tokenCount(TextOps.tokens(col("text")), all.take(k)).as("n"))
        .as[Long].head()
    }
    counts.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"subword count grew with more merges: $counts")
    }
  }

  test("saltedJoin: equals the plain join on random frames for every bucket count") {
    val genFact = Gen.listOfN(60, for {
      k <- Gen.choose(1L, 8L); v <- Gen.choose(0, 999)
    } yield (k, v))
    val genDim = Gen.listOfN(6, for {
      k <- Gen.choose(1L, 10L); w <- Gen.alphaStr.map(_.take(4))
    } yield (k, w))
    val fact = genFact.sample.get.zipWithIndex
      .map { case ((k, v), i) => (k, v, i.toLong) }.toDF("k", "v", "rid")
    val dim = genDim.sample.get.toDF("k", "w")
    for (buckets <- Seq(1, 3, 16); jt <- Seq("inner", "left")) {
      val got = graft.ops.Skew.saltedJoin(fact, dim, "k", col("rid"), buckets, jt)
        .select("k", "v", "rid", "w")
        .as[(Long, Int, Long, Option[String])].collect().sorted
      val want = fact.join(dim, Seq("k"), jt)
        .select("k", "v", "rid", "w")
        .as[(Long, Int, Long, Option[String])].collect().sorted
      assert(got.toSeq == want.toSeq, s"buckets=$buckets type=$jt")
    }
  }
}
