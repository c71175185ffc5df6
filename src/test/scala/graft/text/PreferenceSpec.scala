package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class PreferenceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pairStats: every hygiene clause has a dedicated case") {
    val pairs = Seq(
      // (id, prompt, chosen, rejected)
      (1L, "explain spark", "a distributed sql engine", "a slow single node script"),
      (2L, "same answer", "identical text here", "identical  TEXT here"), // normalizes equal
      (3L, "near dup", "alpha beta gamma delta epsilon", "beta alpha gamma epsilon delta"), // same set -> jac 1.0
      (4L, "blank side", "a real answer here", "   "),
      (5L, "both blank", "", " "))
      .toDF("id", "prompt", "chosen", "rejected")
    val got = Preference.pairStats(pairs, "id", "prompt", "chosen", "rejected")
      .as[(Long, Long, Long, Long, Double, Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // 1: healthy pair — distinct vocab, kept
    assert(got(1L)._7 && !got(1L)._6 && got(1L)._5 < 0.9)
    assert(got(1L)._2 == 2L && got(1L)._3 == 4L && got(1L)._4 == 5L)
    // 2: identical after normalization — zero signal, dropped
    assert(got(2L)._6 && !got(2L)._7)
    // 3: a reorder (token-set Jaccard 1.0) — dropped by the overlap cap
    assert(!got(3L)._6 && got(3L)._5 == 1.0 && !got(3L)._7)
    // 4: blank rejected — jaccard 0, dropped on emptiness
    assert(got(4L)._4 == 0L && got(4L)._5 == 0.0 && !got(4L)._7)
    // 5: both blank — identical emptiness
    assert(got(5L)._5 == 1.0 && got(5L)._6 && !got(5L)._7)
  }

  test("tokenJaccard: subset sampling gives |sub| / |full|") {
    val df = Seq(("a b c d", "a c")).toDF("x", "y")
    val j = df.select(Preference.tokenJaccard($"x", $"y")).as[Double].head()
    assert(j == 0.5)
  }

  test("pairStats is a shuffle-free projection") {
    val pairs = (1L to 30L).map(i => (i, "p", s"chosen $i text", s"rejected $i words"))
      .toDF("id", "prompt", "chosen", "rejected")
    val plan = Preference.pairStats(pairs, "id", "prompt", "chosen", "rejected")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
