package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("sourceCap keeps the top-quality docs per source, ties broken by id") {
    val docs = Seq(
      (1L, "a", 10.0), (2L, "a", 30.0), (3L, "a", 20.0), (4L, "a", 30.0),
      (5L, "b", 1.0), (6L, "b", 2.0),
      (7L, "c", 5.0))
      .toDF("doc_id", "source", "quality")
    val kept = Curation.sourceCap(docs, "doc_id", "source", "quality", cap = 2)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // source a: quality 30 ties between ids 2 and 4 -> id order keeps both
    assert(kept == Seq(2L, 4L, 5L, 6L, 7L))
    assert(Curation.sourceCap(docs, "doc_id", "source", "quality", 10)
      .count() == 7)
    intercept[IllegalArgumentException] {
      Curation.sourceCap(docs, "doc_id", "source", "quality", 0)
    }
  }

  test("sourceCap ranks null quality last") {
    val docs = Seq((1L, "a", Some(1.0)), (2L, "a", None), (3L, "a", Some(2.0)))
      .toDF("doc_id", "source", "quality")
    val kept = Curation.sourceCap(docs, "doc_id", "source", "quality", 2)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L))
  }

  // 60 docs in three quality tiers: tier 0 is fluent repetition of the
  // corpus's dominant transitions, tier 2 is unique-word soup that the
  // self-trained bigram LM scores as improbable
  private lazy val tiered = (0L until 60L).map { i =>
    val tier = (i % 3).toInt
    val text = tier match {
      case 0 => "the cat sat on the mat and the cat sat on the mat again"
      case 1 => s"the cat ran to x$i and the dog sat on y$i near the mat"
      case _ => (0 until 14).map(j => s"z${i}w$j").mkString(" ")
    }
    (i, text)
  }.toDF("doc_id", "text")

  test("perplexityBuckets exactRank: terciles ordered by score") {
    val b = Curation.perplexityBuckets(tiered, "doc_id", "text",
      exactRank = true)
    val rows = b.select("bucket", "avg_logprob")
      .as[(Long, Double)].collect()
    assert(rows.length == 60)
    assert(rows.map(_._1).distinct.sorted.toSeq == Seq(1L, 2L, 3L))
    val byBucket = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(byBucket.values.forall(_.length == 20)) // even terciles
    assert(byBucket(1L).min >= byBucket(2L).max)
    assert(byBucket(2L).min >= byBucket(3L).max)
  }

  test("perplexityBuckets approx mode: shares near terciles, ordering invariant holds") {
    val b = Curation.perplexityBuckets(tiered, "doc_id", "text")
    val rows = b.select("bucket", "avg_logprob")
      .as[(Long, Double)].collect()
    assert(rows.length == 60)
    val byBucket = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // every bucket populated, no bucket hogging (t-digest on 60 points
    // lands within a few docs of the exact terciles)
    assert(byBucket.keySet == Set(1L, 2L, 3L))
    assert(byBucket.values.forall(v => v.length >= 12 && v.length <= 28))
    // value-cut assignment preserves the score ordering exactly
    assert(byBucket(1L).min >= byBucket(2L).max)
    assert(byBucket(2L).min >= byBucket(3L).max)
    // the fluent tier lands in the head bucket
    val headIds = b.where($"bucket" === 1).select("doc_id")
      .as[Long].collect().toSet
    assert((0L until 60L by 3L).toSet.subsetOf(headIds))
  }

  // two "languages": lang a = the tiered docs, lang b = 30 docs that the
  // pooled LM scores uniformly poorly (unique vocab) — a pooled cut
  // would put ALL of lang b in the tail; per-language cuts must not
  private lazy val twoLang =
    (0L until 60L).map { i =>
      val tier = (i % 3).toInt
      val text = tier match {
        case 0 => "the cat sat on the mat and the cat sat on the mat again"
        case 1 => s"the cat ran to x$i and the dog sat on y$i near the mat"
        case _ => (0 until 14).map(j => s"z${i}w$j").mkString(" ")
      }
      (i, "a", text)
    } ++ (100L until 130L).map(i => (i, "b",
      (0 until 14).map(j => s"q${i}r$j").mkString(" ")))

  test("perplexityBucketsBy: per-group terciles, no group consigned to the tail") {
    val docs = twoLang.toDF("doc_id", "lang", "text")
    val b = Curation.perplexityBucketsBy(docs, "doc_id", "text", "lang",
      exactRank = true)
    val rows = b.select("lang", "bucket").as[(String, Long)].collect()
    val byLang = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // every language spans all three buckets — the pooled cut would give
    // lang b only bucket 3
    assert(byLang("a").toSet == Set(1L, 2L, 3L) || byLang("a").distinct.size == 3)
    assert(byLang("b").toSet == Set(1L, 2L, 3L))
    assert(byLang("b").count(_ == 1L) == 10) // even terciles of 30
    // approx mode: same per-group ordering invariant
    val approx = Curation.perplexityBucketsBy(docs, "doc_id", "text", "lang")
      .select("lang", "bucket", "avg_logprob")
      .as[(String, Long, Double)].collect()
    approx.groupBy(_._1).foreach { case (_, rs) =>
      val byB = rs.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
      byB.keySet.toSeq.sorted.sliding(2).foreach {
        case Seq(hi, lo) => assert(byB(hi).min >= byB(lo).max)
        case _ =>
      }
    }
  }

  test("c4LineFilter: word floor, terminal punct, blocklist, braces, doc floor") {
    val docs = Seq(
      (1L, "This line has enough words to survive the filter.\nshort one\nAnother good line with plenty of words in it."),
      (2L, "Enable JavaScript and cookies to continue reading this page today."),
      (3L, "if (x) { return y; } this document looks like code honestly."),
      (4L, "no terminal punctuation on this otherwise long enough line here"),
      (5L, "One single fine sentence with enough words to pass easily."))
      .toDF("doc_id", "text")
    val out = Curation.c4LineFilter(docs, "doc_id", "text",
      minLineWords = 5, requireTerminalPunct = true,
      blocklist = Seq("javascript", "cookie"), dropBraces = true,
      minKeptLines = 1)
    val rows = out.select("doc_id", "text_clean", "total_lines", "kept_lines")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(rows.map(_._1) == Seq(1L, 5L)) // 2 blocklisted, 3 braces, 4 punct
    val d1 = rows.head
    assert(d1._3 == 3 && d1._4 == 2)
    assert(!d1._2.contains("short one"))
    assert(d1._2.split("\n").length == 2)
  }

  test("c4LineFilter without punct requirement keeps unpunctuated prose") {
    val docs = Seq((1L, "ten words of plain prose with no punctuation at all"))
      .toDF("doc_id", "text")
    assert(Curation.c4LineFilter(docs, "doc_id", "text",
      minLineWords = 5, requireTerminalPunct = false).count() == 1)
    assert(Curation.c4LineFilter(docs, "doc_id", "text",
      minLineWords = 15, requireTerminalPunct = false).count() == 0)
  }

  test("c4LineFilter is shuffle-free") {
    val docs = Seq((1L, "a fine line with many words inside it today."))
      .toDF("doc_id", "text")
    val plan = Curation.c4LineFilter(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(800))
  }
}
