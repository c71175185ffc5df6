package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Generation-eval metrics: clipped n-gram matches (the BLEU modified
  * precision), ROUGE-N P/R/F1, ROUGE-L LCS kernel vs a driver-side
  * reference DP, corpus BLEU with brevity penalty. */
class GenEvalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("rougeN clips candidate n-grams at the reference count") {
    // Papineni's degenerate candidate: 7x "the" vs a ref with two "the"
    val df = Seq((1L, "the the the the the the the",
      "the cat is on the mat")).toDF("id", "cand", "ref")
    val r = GenEval.rougeN(df, "id", "cand", "ref", n = 1).head()
    assert(r.getLong(1) == 2 && r.getLong(2) == 7 && r.getLong(3) == 6)
    assert(r.getDouble(4) == 0.285714) // 2/7
    assert(r.getDouble(5) == 0.333333) // 2/6
  }

  test("rougeN bigram: exact match is 1.0 everywhere, disjoint is 0") {
    val df = Seq((1L, "a b c d", "a b c d"), (2L, "a b c", "x y z"))
      .toDF("id", "cand", "ref")
    val m = GenEval.rougeN(df, "id", "cand", "ref", n = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(m(1L) == ((3L, 1.0, 1.0, 1.0)))
    assert(m(2L) == ((0L, 0.0, 0.0, 0.0)))
  }

  test("rougeL matches a driver-side LCS reference on pseudo-random pairs") {
    def lcsRef(a: Seq[String], b: Seq[String]): Int = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
          else math.max(dp(i - 1)(j), dp(i)(j - 1))
      dp(a.length)(b.length)
    }
    val rng = new scala.util.Random(7)
    val pairs = (1L to 40L).map { i =>
      val vocab = Vector("a", "b", "c", "d", "e")
      def sent(n: Int) = Seq.fill(n)(vocab(rng.nextInt(vocab.size)))
      (i, sent(3 + rng.nextInt(12)), sent(3 + rng.nextInt(12)))
    }
    val df = pairs.map { case (i, c, r) => (i, c.mkString(" "), r.mkString(" ")) }
      .toDF("id", "cand", "ref")
    val got = GenEval.rougeL(df, "id", "cand", "ref")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { case (i, c, r) => assert(got(i) == lcsRef(c, r), s"pair $i") }
  }

  test("rougeL canonical: the cat sat / the dog sat") {
    val df = Seq((1L, "the cat sat", "the dog sat")).toDF("id", "cand", "ref")
    val r = GenEval.rougeL(df, "id", "cand", "ref").head()
    assert(r.getLong(1) == 2 && r.getDouble(4) == 0.666667)
  }

  test("corpus BLEU: perfect match is 1.0; brevity penalty bites") {
    val perfect = Seq((1L, "a b c d e", "a b c d e")).toDF("id", "cand", "ref")
    val p = GenEval.bleu(perfect, "cand", "ref").head()
    assert(p.getDouble(p.fieldIndex("bleu")) == 1.0)
    assert(p.getDouble(p.fieldIndex("bp")) == 1.0)
    // candidate = 4-token prefix of a 5-token ref: p_n all 1, bp = e^(1-5/4)
    val short = Seq((1L, "a b c d", "a b c d e")).toDF("id", "cand", "ref")
    val s = GenEval.bleu(short, "cand", "ref").head()
    val bp = math.exp(1 - 5.0 / 4.0)
    assert(math.abs(s.getDouble(s.fieldIndex("bp")) - bp) < 1e-6)
    assert(math.abs(s.getDouble(s.fieldIndex("bleu")) - bp) < 1e-6)
    assert(s.getLong(0) == 4 && s.getLong(1) == 5)
  }

  test("corpus BLEU is 0 when any order has no match, and pools pairs") {
    // no 4-gram overlap anywhere -> p4 = 0 -> bleu 0
    val df = Seq((1L, "a b c x", "a b c y")).toDF("id", "cand", "ref")
    val r = GenEval.bleu(df, "cand", "ref").head()
    assert(r.getDouble(r.fieldIndex("bleu")) == 0.0)
    assert(r.getDouble(r.fieldIndex("p1")) == 0.75)
    // corpus pooling: counts sum BEFORE the precision ratio (2+0)/(2+2)
    val two = Seq((1L, "a b", "a b"), (2L, "x y", "p q")).toDF("id", "cand", "ref")
    val t = GenEval.bleu(two, "cand", "ref", maxN = 1).head()
    assert(t.getDouble(t.fieldIndex("p1")) == 0.5)
  }

  test("chrF: identical long strings score 1, disjoint score 0, recall-weighted") {
    val df = Seq((1L, "abcdefgh", "abcdefgh"), (2L, "aaaa bbbb", "cccc dddd"))
      .toDF("id", "cand", "ref")
    val m = GenEval.chrF(df, "id", "cand", "ref")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(1L) == 1.0) // every order 1..6 present and perfect
    assert(m(2L) == 0.0)
    // beta = 2 weights recall: a candidate MISSING ref chars scores
    // lower than one ADDING extra chars (same char precision deficit)
    val asym = Seq((1L, "abcdef", "abcdefgh"), (2L, "abcdefgh", "abcdef"))
      .toDF("id", "cand", "ref")
    val a = GenEval.chrF(asym, "id", "cand", "ref")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a(1L) < a(2L))
  }

  test("chrF hand-computed single-order case") {
    // maxN=1, beta=2: cand chars {a,b}, ref {a,c}: m=1, P=1/2, R=1/2,
    // F2 = 5PR/(4P+R) = (5/4)/(5/2) = 0.5
    val df = Seq((1L, "ab", "ac")).toDF("id", "cand", "ref")
    val r = GenEval.chrF(df, "id", "cand", "ref", maxN = 1).head()
    assert(r.getDouble(1) == 0.5)
  }

  test("diversity: hand-computed distinct-n and entropy, per-group") {
    // corpus: "a a b" + "a b" -> unigrams a,a,b,a,b: T=5, distinct 2,
    // entropy = ln5 - (3 ln3 + 2 ln2)/5
    val df = Seq((1L, "a a b", "x"), (2L, "a b", "x")).toDF("id", "text", "g")
    val m = GenEval.diversity(df, "text", ns = Seq(1, 2))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val h1 = math.log(5) - (3 * math.log(3) + 2 * math.log(2)) / 5
    assert(m(1)._1 == 5 && m(1)._2 == 2)
    assert(math.abs(m(1)._3 - 0.4) < 1e-6)
    assert(math.abs(m(1)._4 - h1) < 1e-6)
    // bigrams: "a a","a b" + "a b" -> T=3, distinct 2
    assert(m(2)._1 == 3 && m(2)._2 == 2)
    // grouped: each group's report is computed within the group
    val g = Seq((1L, "a a", "g1"), (2L, "b b", "g2")).toDF("id", "text", "g")
    val gm = GenEval.diversity(g, "text", ns = Seq(1), groupCols = Seq("g"))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(gm("g1") == ((2L, 1L)) && gm("g2") == ((2L, 1L)))
  }

  test("diversity: a template-looping corpus scores lower than a varied one") {
    val looped = (1L to 50L).map(i => (i, "the quick brown fox jumps"))
      .toDF("id", "text")
    val varied = (1L to 50L).map(i =>
      (i, s"doc $i mentions topic${i % 17} and fact${(i * 7) % 23}"))
      .toDF("id", "text")
    def ratio(df: org.apache.spark.sql.DataFrame) =
      GenEval.diversity(df, "text", ns = Seq(2)).head().getDouble(3)
    assert(ratio(looped) < 0.05)
    assert(ratio(varied) > 10 * ratio(looped))
  }

  test("per-pair metrics are layout-invariant") {
    val df = (1L to 60L).map(i =>
      (i, s"tok a b c d${i % 3} e f", s"tok a b x d${i % 3} f")).toDF("id", "cand", "ref")
    val a = GenEval.rougeL(df, "id", "cand", "ref").orderBy("id").collect().toSeq
    val b = GenEval.rougeL(df.repartition(13), "id", "cand", "ref")
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("per-pair scoring is shuffle-free and corpus BLEU is one partial agg (plan guard)") {
    val df = (1L to 40L).map(i => (i, s"a b c d$i", s"a b x d$i"))
      .toDF("id", "cand", "ref")
    Seq(GenEval.rougeN(df, "id", "cand", "ref", 2),
        GenEval.rougeL(df, "id", "cand", "ref"),
        GenEval.chrF(df, "id", "cand", "ref")).foreach { out =>
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(800))
    }
    // corpus BLEU: exactly one global HashAggregate pair (partial +
    // final) — one Exchange of ONE row, nothing keyed
    val bleuPlan = GenEval.bleu(df, "cand", "ref")
      .queryExecution.executedPlan.toString
    assert(bleuPlan.contains("HashAggregate"), bleuPlan.take(800))
    assert("Exchange".r.findAllIn(bleuPlan).size <= 1, bleuPlan.take(800))
  }
}
