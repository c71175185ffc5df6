package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** DSIR importance resampling: the fitted log-ratio model, per-document
  * log importance weights, and the deterministic Gumbel top-k draw. */
class DsirSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus(rows: (Long, String)*) = rows.toDF("id", "text")

  test("log-ratio model favors target-like documents") {
    // target talks about cats, raw talks about stocks
    val target = corpus(1L -> "the cat sat", 2L -> "a cat purred softly",
      3L -> "the cat slept on the mat")
    val raw = corpus(10L -> "stocks fell sharply today",
      11L -> "the market rallied", 12L -> "bond yields rose again",
      13L -> "stocks rose as yields fell")
    val m = Dsir.fit(target, raw, "text", "id")
    val w = Dsir.logWeights(
        corpus(100L -> "the cat sat softly", 101L -> "stocks fell as yields rose"),
        "id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(100L) > 0, s"cat-like doc should weigh positive, got ${w(100L)}")
    assert(w(101L) < 0, s"stock-like doc should weigh negative, got ${w(101L)}")
  }

  test("weights match a hand-computed single-feature model") {
    // target = one doc "a", raw = one doc "b": unigrams only, V = 2
    val m = Dsir.fit(corpus(1L -> "a"), corpus(2L -> "b"), "text", "id", k = 0.5)
    // p_t(a) = 1.5/2, p_r(a) = 0.5/2 -> ratio ln(3); p_t(b) = 0.5/2, p_r(b) = 1.5/2
    val r = m.ratios.collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(r("a") - math.log(3.0)) < 1e-12)
    assert(math.abs(r("b") + math.log(3.0)) < 1e-12)
    // unseen feature: ln(denomR/denomT) = ln(2/2) = 0 here
    assert(m.unseenLogRatio == 0.0)
    val w = Dsir.logWeights(corpus(5L -> "a a b", 6L -> "zz"), "id", "text", m)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
      .map(x => x._1 -> x).toMap
    // "a a b": feats = a, a, b, "a a", "a b"; bigrams unseen -> 0 each
    assert(w(5L)._2 == 5L)
    assert(math.abs(w(5L)._3 - math.log(3.0)) < 1e-3) // 2*ln3 - ln3 + 0 + 0
    assert(w(6L)._2 == 1L && w(6L)._3 == 0.0) // fully unseen
  }

  test("resample prefers heavy docs, is deterministic, and bounds at n") {
    val target = corpus(1L -> "cat cat cat cat", 2L -> "cat cat cat")
    val raw = (10L to 49L).map(i => i -> s"stock market day $i")
    val pool = corpus((raw :+ (50L -> "cat cat cat cat cat")): _*)
    val m = Dsir.fit(target, corpus(raw: _*), "text", "id")
    val a = Dsir.resample(pool, "id", "text", m, n = 5).collect()
    val b = Dsir.resample(pool.repartition(7), "id", "text", m, n = 5).collect()
    assert(a.length == 5)
    assert(a.map(_.getLong(0)).toSet == b.map(_.getLong(0)).toSet,
      "draw must be independent of physical layout")
    // the one overwhelmingly-target-like doc must be in any 5-of-41 draw
    assert(a.map(_.getLong(0)).contains(50L))
  }

  test("passCols survive the draw; invalid args rejected") {
    val docs = Seq((1L, "a b", "s1"), (2L, "c d", "s2")).toDF("id", "text", "src")
    val m = Dsir.fit(docs, docs, "text", "id")
    val out = Dsir.resample(docs, "id", "text", m, n = 2, passCols = Seq("src"))
    assert(out.columns.toSeq == Seq("id", "n_feats", "log_weight", "src"))
    assert(out.collect().length == 2)
    intercept[IllegalArgumentException] {
      Dsir.fit(docs, docs, "text", "id", k = 0.0)
    }
    intercept[IllegalArgumentException] {
      Dsir.resample(docs, "id", "text", m, n = 0)
    }
  }
}
