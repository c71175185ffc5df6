package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class PackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("packSequences: contiguous offsets in id order, spanning docs cross windows") {
    val docs = Seq((1L, 300L), (2L, 300L), (3L, 0L), (4L, 500L))
      .toDF("doc_id", "n_tokens")
    val got = Packing.packSequences(docs, "doc_id", "n_tokens", ctxLen = 512)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // stream: doc1 [0,300), doc2 [300,600) spans the 512 boundary,
    // doc4 [600,1100) spans 1024; doc3 occupies no space and is dropped
    assert(got == Set(
      (1L, 300L, 0L, 0L, 0L),
      (2L, 300L, 300L, 0L, 1L),
      (4L, 500L, 600L, 1L, 2L)))
  }

  test("packSequences is layout-invariant and has no single-partition window") {
    val docs = (1L to 400L).map(i => (i, 10L + i % 7)).toDF("doc_id", "n_tokens")
    def run(parts: Int) =
      Packing.packSequences(docs.repartition(parts), "doc_id", "n_tokens", 128)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    val one = run(1)
    assert(run(13) == one)
    assert(one.size == 400)
    // offsets are the exclusive prefix sum: max end == total tokens
    val total = (1L to 400L).map(i => 10L + i % 7).sum
    assert(one.map(r => r._3 + r._2).max == total)
    // the scan must be distributed: no global-order window (which Spark
    // plans as a single-partition sort) in the physical plan
    val plan = Packing.packSequences(docs.repartition(8), "doc_id", "n_tokens", 128)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("packBinsNextFit: docs never split, sequential next-fit semantics") {
    val docs = Seq((1L, 500L), (2L, 500L), (3L, 300L), (4L, 900L),
      (5L, 1500L), (6L, 100L), (7L, 0L))
      .toDF("doc_id", "n")
    val got = Packing.packBinsNextFit(docs, "doc_id", "n", capacity = 1000)
      .as[(Long, Long, Long, Long)].collect().toSet
    // bin 1: docs 1+2 (1000 exactly); bin 3: doc 3 (doc 4 won't fit after
    // it? 300+900>1000 -> doc 4 opens bin 4); doc 5 oversized -> own bin;
    // doc 6 opens a fresh bin after the oversized one; doc 7 dropped
    assert(got == Set(
      (1L, 500L, 1L, 0L),
      (2L, 500L, 1L, 500L),
      (3L, 300L, 3L, 0L),
      (4L, 900L, 4L, 0L),
      (5L, 1500L, 5L, 0L),
      (6L, 100L, 6L, 0L)))
  }

  test("packBinsNextFit: bins respect capacity, layout-invariant, chunk waste bounded") {
    val docs = (1L to 500L).map(i => (i, 50L + (i * 37) % 400)).toDF("doc_id", "n")
    def run(parts: Int, chunkDocs: Long) =
      Packing.packBinsNextFit(docs.repartition(parts), "doc_id", "n",
        capacity = 1000, chunkDocs = chunkDocs)
        .as[(Long, Long, Long, Long)].collect().toSet
    val one = run(1, 1L << 20)
    // deterministic under input layout changes
    assert(run(17, 1L << 20) == one)
    assert(one.size == 500)
    // every bin's fill = max(offset + n) <= capacity (no oversized docs here)
    val fills = one.groupBy(_._3).map { case (_, rs) => rs.map(r => r._4 + r._2).max }
    assert(fills.forall(_ <= 1000))
    // offsets within a bin are contiguous: sorted offsets chain exactly
    one.groupBy(_._3).foreach { case (_, rs) =>
      val sorted = rs.toSeq.sortBy(_._4)
      sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
        assert(a._4 + a._2 == b._4) }
    }
    // chunked packing equals unchunked except at chunk boundaries: bin
    // count grows by at most nChunks - 1
    val chunked = run(8, 100L)
    assert(chunked.map(_._3).size >= one.map(_._3).size)
    assert(chunked.groupBy(_._3).size <= one.groupBy(_._3).size + 4)
    // and chunked assignment is ALSO layout-invariant
    assert(run(3, 100L) == chunked)
  }

  test("packSegments: hand-computed (window, doc) slices; blank docs vanish") {
    val docs = Seq((1L, "a b c"), (2L, "d e f g"), (3L, "   "), (4L, "h i"))
      .toDF("doc_id", "text")
    val got = Packing.packSegments(docs, "doc_id", "text", ctxLen = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // stream: doc1 [0,3) doc2 [3,7) doc4 [7,9); windows of 4
    assert(got == Set(
      (0L, 1L, 0L, 0L, 3L), // w0: doc1 tokens 0..2 at window offset 0
      (0L, 2L, 0L, 3L, 1L), // w0: doc2 token 0 fills the window
      (1L, 2L, 1L, 0L, 3L), // w1: doc2 tokens 1..3
      (1L, 4L, 0L, 3L, 1L), // w1: doc4 token 0
      (2L, 4L, 1L, 0L, 1L)))// w2: doc4's last token, partial window
  }

  test("packWindows: materialized text is the chopped stream, last window short") {
    val docs = Seq((1L, "a b c"), (2L, "d e f g"), (4L, "h i"))
      .toDF("doc_id", "text")
    val got = Packing.packWindows(docs, "doc_id", "text", ctxLen = 4)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, 2L, 4L, "a b c d"),
      (1L, 2L, 4L, "e f g h"),
      (2L, 1L, 1L, "i")))
  }

  test("packSegments invariants: docs covered once, windows tile, layout-invariant") {
    val docs = (1L to 300L)
      .map(i => (i, ("w" + i + " ") * (1 + (i % 11).toInt))).toDF("doc_id", "text")
    def run(parts: Int) =
      Packing.packSegments(docs.repartition(parts), "doc_id", "text", ctxLen = 32)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    val one = run(1)
    assert(run(7) == one)
    // every doc's segments cover exactly its token count, contiguously
    val perDoc = one.groupBy(_._2)
    (1L to 300L).foreach { id =>
      val want = 1 + (id % 11)
      val segs = perDoc(id).toSeq.sortBy(_._3)
      assert(segs.map(_._5).sum == want)
      assert(segs.head._3 == 0L)
      segs.zip(segs.drop(1)).foreach { case (a, b) => assert(a._3 + a._5 == b._3) }
    }
    // every window except the last holds exactly ctxLen tokens, tiled
    val total = (1L to 300L).map(i => 1 + (i % 11)).sum
    val perWin = one.groupBy(_._1)
    val lastWin = perWin.keys.max
    perWin.foreach { case (w, segs) =>
      val sorted = segs.toSeq.sortBy(_._4)
      assert(sorted.head._4 == 0L)
      sorted.zip(sorted.drop(1)).foreach { case (a, b) => assert(a._4 + a._5 == b._4) }
      val fill = sorted.map(_._5).sum
      if (w == lastWin) assert(fill == ((total - 1) % 32) + 1)
      else assert(fill == 32L, s"window $w fill $fill")
    }
    // and the plan stays free of single-partition stages
    val plan = Packing.packSegments(docs.repartition(5), "doc_id", "text", 32)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("packWindows equals re-slicing packSegments by hand") {
    val docs = (1L to 120L)
      .map(i => (i, (0 until (1 + (i % 5)).toInt).map(j => s"t${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val win = Packing.packWindows(docs, "doc_id", "text", ctxLen = 16)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    // reconstruct from the segment map + raw tokens
    val toks = docs.collect().map(r =>
      r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val segs = Packing.packSegments(docs, "doc_id", "text", ctxLen = 16)
      .as[(Long, Long, Long, Long, Long)].collect()
    val rebuilt = segs.groupBy(_._1).map { case (w, ss) =>
      val text = ss.sortBy(_._4).flatMap { case (_, id, ds, _, n) =>
        toks(id).slice(ds.toInt, (ds + n).toInt) }.mkString(" ")
      (w, ss.length.toLong, ss.map(_._5).sum, text)
    }.toSeq.sortBy(_._1)
    assert(win.toSeq == rebuilt)
  }
}
