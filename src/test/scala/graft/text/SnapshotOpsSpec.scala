package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SnapshotOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("corpusDiff classifies added/removed/changed/unchanged") {
    val oldSnap = Seq(
      (1L, "alpha beta"), (2L, "gamma delta"), (3L, "stays the same"))
      .toDF("doc_id", "text")
    val newSnap = Seq(
      (2L, "gamma delta REWRITTEN"), (3L, "Stays   THE same"), (4L, "brand new doc"))
      .toDF("doc_id", "text")
    val got = SnapshotOps.corpusDiff(oldSnap, newSnap, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    // doc 3: fingerprint is whitespace-normalized + lowercased -> unchanged
    assert(got == Map(1L -> "removed", 2L -> "changed",
      3L -> "unchanged", 4L -> "added"))
  }

  test("corpusDiff plan: fingerprints computed before the join, no text in the join") {
    val a = spark.range(100).select(col("id").as("doc_id"),
      concat(lit("doc "), col("id")).as("text"))
    val plan = SnapshotOps.corpusDiff(a, a, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // the join operates on (id, md5) projections — the text column must
    // not appear in any exchange
    assert(!plan.contains("text#") ||
      !plan.split("Exchange").drop(1).exists(_.contains("text#")), plan.take(2000))
  }

  test("tokenDrift: identical corpora diverge zero, disjoint near ln 2") {
    val a = Seq((1L, "the cat sat"), (2L, "the dog ran")).toDF("doc_id", "text")
    val same = SnapshotOps.tokenDrift(a, a, "text")
      .select("js_divergence").as[Double].head()
    assert(same == 0.0)
    val b = Seq((1L, "totally different words here")).toDF("doc_id", "text")
    val disj = SnapshotOps.tokenDrift(a, b, "text")
      .select("js_divergence").as[Double].head()
    assert(math.abs(disj - math.log(2)) < 1e-4) // output is rounded to 4 places
  }

  test("tokenDriftBy: per-stratum divergence, one-sided stratum pins to ln(2)/2") {
    val a = Seq((1L, "en", "the cat sat"), (2L, "de", "der hund lief"))
      .toDF("doc_id", "lang", "text")
    val b = Seq((3L, "en", "the cat sat"), (4L, "fr", "le chat noir"))
      .toDF("doc_id", "lang", "text")
    val got = SnapshotOps.tokenDriftBy(a, b, "text", "lang")
      .select("lang", "js_divergence").as[(String, Double)].collect().toMap
    assert(got.keySet == Set("en", "de", "fr"))
    assert(got("en") == 0.0)                          // identical
    val half = BigDecimal(math.log(2) / 2).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("de") == half && got("fr") == half)    // one-sided ceiling
  }

  test("healthReport: hand-checked metrics on a tiny corpus") {
    val docs = Seq(
      (1L, "en", "the cat sat on the mat today fine words here"), // 10 toks
      (2L, "en", "the cat sat on the mat today fine words here"), // exact dup
      (3L, "de", "kurz"),                                         // short
      (4L, "fr", "le chat noir dort bien sur le tapis rouge la")) // 10 toks
      .toDF("doc_id", "lang", "text")
    val got = SnapshotOps.healthReport(docs, "doc_id", "text", "lang")
      .as[(String, Double)].collect().toMap
    assert(got("n_docs") == 4.0)
    assert(got("n_tokens") == 31.0)       // 10 + 10 (dup counts) + 1 + 10
    assert(got("pct_exact_dup") == 0.25)  // 3 distinct fps over 4 docs
    assert(got("pct_short") == 0.25)      // doc 3 under 10 tokens
    assert(got("mean_doc_tokens") == 7.75)
    // entropy of (2/4, 1/4, 1/4) in nats
    val ent = -(0.5 * math.log(0.5) + 2 * 0.25 * math.log(0.25))
    assert(math.abs(got("lang_entropy") - ent) < 1e-4)
  }

  test("tokenDrift side stats and bounded drift for overlapping corpora") {
    val a = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val b = Seq((1L, "the cat ran off the mat")).toDF("doc_id", "text")
    val r = SnapshotOps.tokenDrift(a, b, "text")
      .as[(Long, Long, Long, Long, Long, Double)].head()
    assert(r._1 == 6 && r._2 == 6)
    assert(r._3 == 5 && r._4 == 5) // "the" twice per side
    assert(r._5 == 7)              // union: the cat sat on mat ran off
    assert(r._6 > 0.0 && r._6 < math.log(2))
  }

  test("dupBySource: duplicate mass attributed to the feeds that ship it") {
    val docs = Seq(
      (1L, "the cat sat", "feedA"),
      (2L, "the  CAT sat", "feedB"),   // dup of 1 after normalization
      (3L, "the cat sat", "feedB"),    // dup again, same feed as 2
      (4L, "unique text one", "feedA"),
      (5L, "unique text two", "feedC"))
      .toDF("doc_id", "text", "source")
    val got = SnapshotOps.dupBySource(docs, "doc_id", "text", "source")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("feedA") == (("feedA", 2L, 1L, 0.5)))
    assert(got("feedB") == (("feedB", 2L, 2L, 1.0)))
    assert(got("feedC") == (("feedC", 1L, 0L, 0.0)))
  }

  test("sourceOverlap: unordered pairs with shared DISTINCT fingerprints") {
    val docs = Seq(
      (1L, "shared alpha", "feedA"), (2L, "shared alpha", "feedB"),
      (3L, "shared beta", "feedA"), (4L, "shared beta", "feedB"),
      (5L, "shared beta", "feedC"),
      (6L, "only here", "feedA"))
      .toDF("doc_id", "text", "source")
    val got = SnapshotOps.sourceOverlap(docs, "doc_id", "text", "source")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(
      ("feedA", "feedB", 2L),   // alpha + beta
      ("feedA", "feedC", 1L),   // beta
      ("feedB", "feedC", 1L)))
  }
}
