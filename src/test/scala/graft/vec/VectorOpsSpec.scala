package graft.vec

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class VectorOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),   // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f)),  // opposite of 0
    (4L, Array(0.8f, 0.2f, 0.0f)))   // close-ish to 0
    .toDF("vec_id", "embedding")

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val a = VectorOps.asDouble($"embedding")
    val self = vecs.select(round(VectorOps.cosine(a, a), 6).as("c"))
      .as[Double].collect()
    assert(self.forall(_ == 1.0))
  }

  test("l2sq kernel is BIT-identical to the aggregate(zip_with) HOF fold") {
    val pairs = Seq(
      (Array(1.0, 2.0, -3.5), Array(0.5, -2.0, 3.25)),
      (Array(0.1, 0.2, 0.3), Array(0.1, 0.2, 0.3)),
      (Array(1e-17, 1e17, -1e-17), Array(-1e17, 1e-17, 1e17)),
      (Array.empty[Double], Array.empty[Double]))
      .toDF("a", "b")
    val rows = pairs.select(
      VectorOps.l2sq(col("a"), col("b")).as("kernel"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x).as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)), r.toString)
    }
  }

  test("adc_lookup kernel is BIT-identical to the aggregate(zip_with/element_at) HOF fold") {
    val rows = Seq(
      (Seq(1, 0, 2), Seq(Seq(1.5, 2.5, 3.5), Seq(0.25, 1.25, 2.25), Seq(7.0, 8.0, 9.0))),
      (Seq(0), Seq(Seq(1e-17))),
      (Seq.empty[Int], Seq.empty[Seq[Double]]))
      .toDF("codes", "tables")
    val got = rows.select(
      VecExpressions.adcLookup(col("codes"), col("tables")).as("kernel"),
      aggregate(zip_with(col("codes"), col("tables"),
          (c, tab) => element_at(tab, c + 1)),
        lit(0.0), (acc, x) => acc + x).as("hof")).collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)), r.toString)
    }
  }

  test("hardNegatives: top-k by cosine among DIFFERENT-label candidates only") {
    val labeled = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 1),
      (1L, Array(0.9f, 0.1f, 0.0f), 1),   // same label as 0 -> never a negative for 0
      (2L, Array(0.8f, 0.2f, 0.0f), 2),   // closest different-label
      (3L, Array(0.0f, 1.0f, 0.0f), 2),
      (4L, Array(-1.0f, 0.0f, 0.0f), 3))
      .toDF("vec_id", "embedding", "label")
    val got = VectorOps.hardNegatives(labeled,
        labeled.where($"vec_id" === 0), "vec_id", "embedding", "label", k = 3)
      .orderBy("rank")
      .select($"neighbor_id", $"neighbor_label").as[(Long, Int)].collect().toSeq
    // 1 excluded (same label) even though it is the most similar overall
    assert(got == Seq((2L, 2), (3L, 2), (4L, 3)))
  }

  test("bruteForceTopK ranks by similarity, excludes self") {
    val got = VectorOps.bruteForceTopK(vecs, vecs.where($"vec_id" === 0),
        "vec_id", "embedding", k = 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 4L, 2L))
  }

  test("hyperplane LSH: identical vectors share a bucket, pairs verified by cosine") {
    val dupVecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.2f)), (1L, Array(1.0f, 0.0f, 0.2f)),
      (2L, Array(-0.5f, 0.9f, -1.0f)))
      .toDF("vec_id", "embedding")
    val pairs = VectorOps.lshCosinePairs(dupVecs, "vec_id", "embedding",
        dim = 3, nBits = 6, threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("ivfTopK returns k ranked neighbors per query") {
    val got = VectorOps.ivfTopK(vecs, vecs.where($"vec_id" === 0),
        "vec_id", "embedding", k = 2, nlist = 3, nprobe = 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(got.head == 1L && got.length == 2)
  }

  test("ivfTopK with k-means refinement still finds the nearest neighbor") {
    val got = VectorOps.ivfTopK(vecs, vecs.where($"vec_id" === 0),
        "vec_id", "embedding", k = 2, nlist = 2, nprobe = 2, kmeansIters = 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(got.head == 1L && got.length == 2)
  }

  test("ivf recall@5 vs brute force stays above the floor on real embeddings") {
    // the default kmeansIters was chosen from graft.dev.IvfRecall
    // measurements (COVERAGE.md); this pins a floor so a regression in
    // seeding/assignment/probing shows up as a recall drop, not silently
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = emb.where($"vec_id" < 16)
    val exact = VectorOps.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .localCheckpoint()
    val approx = VectorOps.ivfTopK(emb, q, "vec_id", "embedding", 5)
    val r = VectorOps.recallAtK(approx, exact)
    assert(r >= 0.85, f"recall@5 = $r%.4f below floor")
  }

  test("pq: exhaustive codebooks make ADC search exactly the L2 ranking") {
    // ksub >= N with zero sweeps: every candidate sub-vector IS a
    // codebook entry, encoding is lossless, and the ADC distance equals
    // exact squared L2 — the property the oracle gate relies on
    val dim4 = Seq(
      (0L, Array(1.0f, 0.0f, 2.0f, 1.0f)),
      (1L, Array(0.9f, 0.1f, 2.0f, 1.0f)),
      (2L, Array(0.0f, 3.0f, -1.0f, 0.5f)),
      (3L, Array(1.1f, -0.1f, 2.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val model = VectorOps.pqTrain(dim4, "vec_id", "embedding",
      m = 2, ksub = 4, iters = 0)
    val got = VectorOps.pqTopK(dim4, dim4.where($"vec_id" === 0),
        "vec_id", "embedding", k = 3, model)
      .orderBy("rank").select("neighbor_id", "dist")
      .as[(Long, Double)].collect().toSeq
    // exact squared L2 from 0: d(1)=0.02, d(3)=0.03, d(2)=19.25
    assert(got.map(_._1) == Seq(1L, 3L, 2L))
    assert(math.abs(got.head._2 - 0.02) < 1e-9)
  }

  test("pq encode: m small codes per vector, identical vectors share codes") {
    val dup = Seq(
      (0L, Array(1.0f, 0.0f, 2.0f, 1.0f)),
      (1L, Array(1.0f, 0.0f, 2.0f, 1.0f)),
      (2L, Array(-1.0f, 2.0f, 0.0f, -0.5f)))
      .toDF("vec_id", "embedding")
    val model = VectorOps.pqTrain(dup, "vec_id", "embedding",
      m = 2, ksub = 2, iters = 1)
    val codes = VectorOps.pqEncode(dup, "vec_id", "embedding", model)
      .select("id", "codes").as[(Long, Seq[Int])].collect().toMap
    assert(codes.values.forall(c => c.length == 2 && c.forall(x => x >= 0 && x < 2)))
    assert(codes(0L) == codes(1L))
    assert(codes(0L) != codes(2L))
  }

  test("pq train: offset/sparse ids still seed full codebooks") {
    // ids far from 0 and non-contiguous: seeds are the ksub SMALLEST ids
    // by rank, not rows with id < ksub (which here would be none)
    val dim4 = Seq(
      (1000000L, Array(0.1f, 0.2f, 1.0f, 0.0f)),
      (1000007L, Array(0.2f, 0.3f, 1.1f, 0.1f)),
      (2000003L, Array(4.0f, -1.0f, 0.5f, 2.0f)),
      (3000009L, Array(-2.0f, 0.7f, -0.3f, 1.5f)))
      .toDF("vec_id", "embedding")
    val model = VectorOps.pqTrain(dim4, "vec_id", "embedding",
      m = 2, ksub = 4, iters = 0)
    assert(model.codebooks.forall(_.length == 4))
    // exhaustive ksub keeps ADC search the exact L2 ranking
    val got = VectorOps.pqTopK(dim4, dim4.where($"vec_id" === 1000000L),
        "vec_id", "embedding", k = 2, model)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(got.head == 1000007L)
  }

  test("pq refined re-rank: exhaustive shortlist equals exact, recall never drops") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = emb.where($"vec_id" < 8)
    val exact = VectorOps.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .localCheckpoint()
    // deliberately lossy model: plain ADC misranks, the re-rank repairs
    val model = VectorOps.pqTrain(emb, "vec_id", "embedding",
      m = 8, ksub = 16, iters = 0)
    val plain = VectorOps.recallAtK(
      VectorOps.pqTopK(emb, q, "vec_id", "embedding", 5, model), exact)
    val refined = VectorOps.recallAtK(
      VectorOps.pqTopKRefined(emb, q, "vec_id", "embedding", 5, model, refine = 4), exact)
    assert(refined >= plain, f"refined $refined%.4f < plain $plain%.4f")
    // shortlist covering every candidate -> must BE the exact neighbor set
    val full = VectorOps.recallAtK(
      VectorOps.pqTopKRefined(emb, q, "vec_id", "embedding", 5, model, refine = 100), exact)
    assert(full == 1.0, f"exhaustive-shortlist recall $full%.4f != 1.0")
  }

  test("ivfpq: exhaustive setting equals exact L2; realistic setting holds a recall floor") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = emb.where($"vec_id" < 8)
    val exact = VectorOps.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .localCheckpoint()
    val n = emb.count().toInt
    val exhaustive = VectorOps.ivfPqTopK(emb, q, "vec_id", "embedding", k = 5,
      nlist = 4, nprobe = 4, m = 8, ksub = n, kmeansIters = 0, pqIters = 0)
    assert(VectorOps.recallAtK(exhaustive, exact) == 1.0)
    // regression tripwire, not a quality claim: the synthetic embeddings
    // are near-random unit vectors (no cluster structure for PQ to
    // exploit), measured 0.30 recall@5 at these settings
    val real = VectorOps.ivfPqTopK(emb, q, "vec_id", "embedding", k = 5,
      nlist = 4, nprobe = 4, m = 8, ksub = 64)
    assert(VectorOps.recallAtK(real, exact) >= 0.25)
  }

  test("ivf assignment plan has no exchange before the probe join") {
    // the whole point of the literal-projection assignment: ranking
    // centroids per row adds NO shuffle — the only exchanges in the final
    // plan are the explicit input spread, the broadcast, and the top-k
    // window by query
    val plan = VectorOps.ivfTopK(vecs, vecs.where($"vec_id" === 0),
        "vec_id", "embedding", k = 2, nlist = 3, nprobe = 3)
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("crossjoin"),
      s"centroid assignment should not cross-join:\n$plan")
  }

  test("semDedup: identical vectors collapse to the smallest id, distinct ones survive") {
    // ids 10/11/12 are identical (scaled copies — same direction), id 13
    // is orthogonal; one cluster per seed with iters=0
    val df = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f)),
      (11L, Array(2.0f, 0.0f, 0.0f)),
      (12L, Array(0.5f, 0.0f, 0.0f)),
      (13L, Array(0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = VectorOps.semDedup(df, "vec_id", "embedding",
        nlist = 2, threshold = 0.99, kmeansIters = 0)
      .orderBy("id").select("id", "keep").as[(Long, Boolean)].collect().toSeq
    assert(got == Seq((10L, true), (11L, false), (12L, false), (13L, true)))
  }

  test("semanticContaminatedIds: flags near-benchmark embeddings once, leaves the rest") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),   // identical to bench vec
      (2L, Array(0.95f, 0.05f, 0.0f)), // near the bench vec
      (3L, Array(0.0f, 0.0f, 1.0f)),   // far from both bench vecs
      (4L, Array(0.0f, 0.9f, 0.1f)))   // near ANOTHER bench vec
      .toDF("vec_id", "embedding")
    val bench = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f)),
      (101L, Array(0.0f, 0.95f, 0.05f)))
      .toDF("vec_id", "embedding")
    val got = VectorOps.semanticContaminatedIds(corpus, bench,
        "vec_id", "embedding", threshold = 0.98)
      .as[Long].collect().toSeq
    assert(got.sorted == Seq(1L, 2L, 4L))
    assert(got.distinct == got) // semi join: at most once per doc
  }

  test("semDedup: integer id columns work (no long assumption)") {
    val df = Seq(
      (10, Array(1.0f, 0.0f)), (11, Array(2.0f, 0.0f)), (12, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding") // vec_id is IntegerType here
    val got = VectorOps.semDedup(df, "vec_id", "embedding",
        nlist = 2, threshold = 0.99, kmeansIters = 0)
      .orderBy("id").select("keep").as[Boolean].collect().toSeq
    assert(got == Seq(true, false, true))
  }

  test("semDedup: cross-cluster near-duplicates are NOT flagged (clustering bounds pairs)") {
    // two near-identical vectors seeded into DIFFERENT clusters (both are
    // seeds): semantic dedup is within-cluster by design — the pair must
    // survive, documenting the approximation the paper accepts
    val df = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.001f)))
      .toDF("vec_id", "embedding")
    val got = VectorOps.semDedup(df, "vec_id", "embedding",
        nlist = 2, threshold = 0.9, kmeansIters = 0)
      .select("keep").as[Boolean].collect().toSeq
    assert(got == Seq(true, true))
  }

  test("semDedup: cluster column is the nearest rank-seed, keep-rule is pairwise-exists") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),   // seed of cluster 0
      (1L, Array(0.0f, 1.0f, 0.0f)),   // seed of cluster 1
      (5L, Array(0.1f, 0.9f, 0.0f)),   // lands in cluster 1
      (9L, Array(0.9f, 0.1f, 0.0f)))   // lands in cluster 0
      .toDF("vec_id", "embedding")
    val got = VectorOps.semDedup(df, "vec_id", "embedding",
        nlist = 2, threshold = 0.95, kmeansIters = 0)
      .orderBy("id").select("id", "cluster", "keep")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got.map(r => r._1 -> r._2) ==
      Seq(0L -> 0L, 1L -> 1L, 5L -> 1L, 9L -> 0L))
    // cos(0, 9) = cos(1, 5) ~= 0.993 >= 0.95: the larger id of each pair drops
    assert(got.map(r => r._1 -> r._3) ==
      Seq(0L -> true, 1L -> true, 5L -> false, 9L -> false))
  }

  test("protoPrune drops the ceil(fraction*n) closest-to-centroid per cluster") {
    // cluster 0 seeded by vec 0 = (1,0,0); members 0,2,3 at cos 1.0,
    // ~0.995, ~0.98 — dropFraction 0.34 on 3 members drops ceil(1.02)=2
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f)),
      (2L, Array(0.99f, 0.1f, 0.0f)),
      (3L, Array(0.95f, 0.2f, 0.0f)),
      (4L, Array(0.1f, 0.99f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = VectorOps.protoPrune(df, "vec_id", "embedding",
        nlist = 2, dropFraction = 0.34, kmeansIters = 0)
      .orderBy("id").select("id", "cluster", "keep")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got.map(r => r._1 -> r._2) ==
      Seq(0L -> 0L, 1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
    // cluster 0: drop 2 of {0 (cos 1.0), 2, 3} -> only 3 survives;
    // cluster 1: drop ceil(0.68)=1 of {1 (cos 1.0), 4} -> 4 survives
    assert(got.map(r => r._1 -> r._3) ==
      Seq(0L -> false, 1L -> false, 2L -> false, 3L -> true, 4L -> true))
  }

  test("protoPrune with refinement keeps cluster structure and the drop budget") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val got = VectorOps.protoPrune(emb, "vec_id", "embedding",
      nlist = 8, dropFraction = 0.2, kmeansIters = 2).localCheckpoint()
    assert(got.count() == emb.count())
    // per cluster, exactly ceil(0.2 * n) rows are dropped
    val perCluster = got.groupBy("cluster")
      .agg(count(lit(1)).as("n"),
        sum(when(!$"keep", 1L).otherwise(0L)).as("dropped"))
      .as[(Long, Long, Long)].collect()
    perCluster.foreach { case (c, n, dropped) =>
      assert(dropped == math.ceil(n * 0.2).toLong,
        s"cluster $c: $dropped dropped of $n") }
    // dropped rows are MORE prototypical than survivors within a cluster
    val worstKept = got.where($"keep").groupBy("cluster")
      .agg(max("proto_cos").as("max_kept"))
    val bestDropped = got.where(!$"keep").groupBy("cluster")
      .agg(min("proto_cos").as("min_dropped"))
    val bad = worstKept.join(bestDropped, "cluster")
      .where($"max_kept" > $"min_dropped").count()
    assert(bad == 0)
  }

  test("clusterCapSample caps each cluster and nests under a growing cap") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val small = VectorOps.clusterCapSample(emb, "vec_id", "embedding",
      cap = 10, nlist = 8, kmeansIters = 0).localCheckpoint()
    val big = VectorOps.clusterCapSample(emb, "vec_id", "embedding",
      cap = 25, nlist = 8, kmeansIters = 0).localCheckpoint()
    val perCluster = small.where($"keep").groupBy("cluster").count()
      .as[(Long, Long)].collect()
    assert(perCluster.forall(_._2 <= 10) && perCluster.nonEmpty)
    // bottom-k md5 sets are nested: every cap-10 pick is a cap-25 pick
    val smallIds = small.where($"keep").select("id").as[Long].collect().toSet
    val bigIds = big.where($"keep").select("id").as[Long].collect().toSet
    assert(smallIds.subsetOf(bigIds))
  }

  test("knnGraph at nlist=1 is the exact graph; clustered mode holds a recall floor") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val exact = VectorOps.knnGraph(emb, "vec_id", "embedding", k = 5,
        nlist = 1, nassign = 1, kmeansIters = 0)
      .withColumnRenamed("src_id", "query_id")
      .withColumnRenamed("dst_id", "neighbor_id")
      .localCheckpoint()
    // exact graph == brute force with the whole corpus as the query batch
    val brute = VectorOps.bruteForceTopK(emb, emb, "vec_id", "embedding", 5)
    assert(exact.except(brute).count() == 0 && brute.except(exact).count() == 0)
    val approx = VectorOps.knnGraph(emb, "vec_id", "embedding", k = 5,
        nlist = 8, nassign = 2, kmeansIters = 2)
      .withColumnRenamed("src_id", "query_id")
      .withColumnRenamed("dst_id", "neighbor_id")
    val r = VectorOps.recallAtK(approx, exact)
    assert(r >= 0.6, f"knn graph recall@5 = $r%.4f below floor")
  }

  test("embeddingDrift: identical snapshots read cos 1.0 / diff 0; a constant shift is localized") {
    import spark.implicits._
    val a = Seq((1L, Seq(1.0f, 0.0f, 2.0f)), (2L, Seq(3.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val same = VectorOps.embeddingDrift(a, a)
      .as[(Long, Long, Long, Double, Double)].head()
    assert(same == ((2L, 2L, 3L, 1.0, 0.0)))
    // shift every vector by +1 on dim 0 only: means (2,0,1) vs (3,0,1)
    val b = Seq((1L, Seq(2.0f, 0.0f, 2.0f)), (2L, Seq(4.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val drift = VectorOps.embeddingDrift(a, b)
      .as[(Long, Long, Long, Double, Double)].head()
    assert(drift._3 == 3L)
    // cos((2,0,1),(3,0,1)) = 7 / (sqrt(5) * sqrt(10))
    assert(math.abs(drift._4 - 7.0 / (math.sqrt(5) * math.sqrt(10))) < 1e-3)
    assert(drift._5 == math.rint(1.0 / 3.0 * 1e4) / 1e4) // |1| on one of 3 dims
  }
}
