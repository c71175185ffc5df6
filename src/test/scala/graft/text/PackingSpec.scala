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
}
