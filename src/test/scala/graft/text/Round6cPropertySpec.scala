package graft.text

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Property tests for the round-6c operators: algebraic claims over
  * randomized inputs — packing conservation, diff involution, redaction
  * idempotence, drift symmetry — the invariants fixtures can't sweep. */
class Round6cPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(4242)

  test("packBinsNextFit: conservation, capacity, and greedy tightness on random sizes") {
    val sizes = (1L to 300L).map(i => (i, 1L + rnd.nextInt(400).toLong))
    val docs = sizes.toDF("doc_id", "n")
    val out = Packing.packBinsNextFit(docs, "doc_id", "n", capacity = 500)
      .as[(Long, Long, Long, Long)].collect()
    // conservation: every doc appears exactly once with its own size
    assert(out.map(_._1).sorted.toSeq == sizes.map(_._1))
    assert(out.map(r => r._1 -> r._2).toMap == sizes.toMap)
    val byBin = out.groupBy(_._3)
    // capacity holds (no oversized docs in this generator)
    assert(byBin.values.forall(_.map(_._2).sum <= 500))
    // greedy tightness: consecutive bins (by first-id order) could not be
    // merged — bin i's fill + bin i+1's FIRST doc overflows capacity
    val bins = byBin.toSeq.sortBy(_._1)
    bins.sliding(2).foreach {
      case Seq((_, a), (_, b)) =>
        val fillA = a.map(_._2).sum
        val firstB = b.minBy(_._4)._2
        assert(fillA + firstB > 500,
          s"bins could merge: fill=$fillA next=$firstB")
      case _ =>
    }
  }

  test("corpusDiff: swapping sides swaps added<->removed, fixes changed/unchanged") {
    val genText = Gen.listOfN(4, Gen.oneOf("x", "y", "z")).map(_.mkString(" "))
    val docs = (1L to 60L).map { i =>
      (i, genText.sample.getOrElse("x"), genText.sample.getOrElse("y"))
    }
    val a = docs.filter(_._1 % 5 != 0).map(d => (d._1, d._2)).toDF("id", "text")
    val b = docs.filter(_._1 % 7 != 0).map(d => (d._1, d._3)).toDF("id", "text")
    val ab = SnapshotOps.corpusDiff(a, b, "id", "text")
      .as[(Long, String)].collect().toMap
    val ba = SnapshotOps.corpusDiff(b, a, "id", "text")
      .as[(Long, String)].collect().toMap
    assert(ab.keySet == ba.keySet)
    ab.foreach { case (id, s) =>
      val expect = s match {
        case "added" => "removed"
        case "removed" => "added"
        case other => other
      }
      assert(ba(id) == expect, s"id $id: $s vs ${ba(id)}")
    }
  }

  test("redactAll is idempotent: redacting redacted text is a no-op") {
    val pieces = Vector("call 555 123 4567 now", "x@y.com", "http://a.b/c?d=1",
      "10.0.0.1", "plain words", "<EMAIL>", "1.2.3.4 and more")
    val docs = (1 to 40).map { i =>
      (i.toLong, Seq.fill(3)(pieces(rnd.nextInt(pieces.size))).mkString(" "))
    }.toDF("id", "text")
    val once = docs.select(col("id"), TextOps.redactAll(col("text")).as("text"))
    val twice = once.select(col("id"), TextOps.redactAll(col("text")).as("text"))
    val a = once.as[(Long, String)].collect().toMap
    val b = twice.as[(Long, String)].collect().toMap
    assert(a == b)
    // and nothing redactable survives a single pass
    a.values.foreach { t =>
      assert(!t.contains("@") || t.contains("<EMAIL>") || !t.matches(".*\\S+@\\S+.*"))
      assert(!t.matches(s".*${TextOps.ipv4Pattern}.*"), t)
    }
  }

  test("tokenDrift is symmetric and tokenDriftBy sums of strata bound the pooled value") {
    val genDoc = Gen.listOfN(8,
      Gen.oneOf("the", "cat", "dog", "ran", "sat", "big")).map(_.mkString(" "))
    val a = (1L to 30L).map(i => (i, if (i % 2 == 0) "en" else "de",
      genDoc.sample.getOrElse("the cat"))).toDF("id", "lang", "text")
    val b = (31L to 60L).map(i => (i, if (i % 2 == 0) "en" else "de",
      genDoc.sample.getOrElse("the dog"))).toDF("id", "lang", "text")
    val ab = SnapshotOps.tokenDrift(a, b, "text")
      .select("js_divergence").as[Double].head()
    val ba = SnapshotOps.tokenDrift(b, a, "text")
      .select("js_divergence").as[Double].head()
    assert(ab == ba) // JS is symmetric
    assert(ab >= 0.0 && ab <= math.log(2) + 1e-9)
    val strata = SnapshotOps.tokenDriftBy(a, b, "text", "lang")
      .select("js_divergence").as[Double].collect()
    assert(strata.forall(v => v >= 0.0 && v <= math.log(2) + 1e-9))
  }
}
