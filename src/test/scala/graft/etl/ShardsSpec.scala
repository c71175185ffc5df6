package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ShardsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus = (1 to 500).map(i => (i.toLong, s"doc number $i", (i % 7) + 1L))
    .toDF("doc_id", "text", "n_tokens")

  test("shards partition the corpus exactly; manifest matches per-shard reads") {
    val out = java.nio.file.Files.createTempDirectory("graft_shards_").toString + "/c"
    val manifest = Shards.write(corpus, "doc_id", "n_tokens", out, nShards = 8)
      .as[(Int, Long, Long)].collect().toSeq
    assert(manifest.map(_._1) == (0 until 8))
    assert(manifest.map(_._2).sum == 500L)
    assert(manifest.map(_._3).sum ==
      corpus.agg(sum("n_tokens")).as[Long].head())
    // the union of shard reads is the corpus, and each shard holds
    // exactly the pmod-assigned ids
    val all = (0 until 8).flatMap(k =>
      Shards.shard(spark, out, k).select("doc_id").as[Long].collect()
        .map(k -> _))
    assert(all.map(_._2).sorted == (1L to 500L))
    assert(all.forall { case (k, id) => id % 8 == k })
    // per-shard manifest rows agree with the actual shard contents
    for ((k, nDocs, nToks) <- manifest) {
      val s = Shards.shard(spark, out, k)
      assert(s.count() == nDocs)
      assert(s.agg(sum("n_tokens")).as[Long].head() == nToks)
    }
  }

  test("rerun is idempotent and the swap leaves no debris") {
    val parent = java.nio.file.Files.createTempDirectory("graft_shards_").toString
    val out = parent + "/c"
    val m1 = Shards.write(corpus, "doc_id", "n_tokens", out, nShards = 4)
      .as[(Int, Long, Long)].collect().toSeq
    val m2 = Shards.write(corpus, "doc_id", "n_tokens", out, nShards = 4)
      .as[(Int, Long, Long)].collect().toSeq
    assert(m1 == m2)
    assert(new java.io.File(parent).listFiles.map(_.getName).toSet == Set("c"))
  }

  test("shard read partition-prunes on the shard directory") {
    val out = java.nio.file.Files.createTempDirectory("graft_shards_").toString + "/c"
    Shards.write(corpus, "doc_id", "n_tokens", out, nShards = 4)
    val q = Shards.shard(spark, out, 2)
    q.count()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("shard"),
      plan.take(800))
  }

  test("curriculum: rank follows (score, id) order, bands slice it evenly, no single-partition sort") {
    val got = Shards.curriculum(corpus, "n_tokens", "doc_id", nBands = 5)
      .select($"doc_id", $"n_tokens", $"curriculum_rank", $"band")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // driver-computed expectation: sort by (score, id), rank 1.., band slices
    val expect = corpus.select($"doc_id", $"n_tokens")
      .as[(Long, Long)].collect().sortBy { case (id, s) => (s, id) }
      .zipWithIndex.map { case ((id, s), i) =>
        (id, s, i + 1L, (i.toLong * 5) / 500) }.toSet
    assert(got.toSet == expect)
    // bands are contiguous rank slices of equal size (500 divides by 5)
    val bySize = got.groupBy(_._4).view.mapValues(_.length).toMap
    assert(bySize.values.toSet == Set(100))
    // plan guard: no global sort — the only SinglePartition exchange
    // allowed is the tiny count() agg that feeds the broadcast; a
    // single-partition SORT would be the scale-killer
    val plan = Shards.curriculum(corpus, "n_tokens", "doc_id", nBands = 5)
      .queryExecution.executedPlan.toString
    // (the range exchange itself sits behind the scan's localCheckpoint,
    // so this plan shows Scan ExistingRDD; what must NOT appear is a
    // global sort — Spark prints those as "Sort [...], true, 0")
    val globalSort = plan.linesIterator.exists(l =>
      l.contains("Sort [") && l.contains("], true,"))
    assert(!globalSort, plan.take(1500))
  }
}
