package graft.vec

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class MmrSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Plain driver-side greedy MMR — the independent reference the
    * distributed fold must reproduce pick-for-pick. */
  private def refMmr(query: Array[Double],
                     cands: Seq[(Long, Array[Double])],
                     k: Int, lambda: Double, pool: Int): Seq[(Long, Double)] = {
    val ranked = cands.map { case (id, v) => (id, v, cos(v, query)) }
      .sortBy { case (id, _, rel) => (-rel, id) }.take(pool)
    var selected = Vector.empty[(Long, Array[Double], Double)]
    for (_ <- 1 to k) {
      val remaining = ranked.filterNot(c => selected.exists(_._1 == c._1))
      val scored = remaining.map { case (id, v, rel) =>
        val pen = if (selected.isEmpty) 0.0
          else selected.map(s => cos(v, s._2)).max
        (id, v, lambda * rel - (1 - lambda) * pen)
      }
      val best = scored.minBy { case (id, _, m) => (-m, id) }
      selected :+= best
    }
    selected.map { case (id, _, m) => (id, m) }
  }

  test("hand case: low lambda trades the near-duplicate for diversity") {
    val q = Seq((100L, Array(1.0f, 0.0f)))
    val cands = Seq(
      (1L, Array(1.0f, 0.01f)),   // most relevant
      (2L, Array(0.999f, 0.04f)), // near-duplicate of 1
      (3L, Array(0.0f, 1.0f)))    // orthogonal
    val all = (cands ++ q).toDF("vec_id", "embedding")
    val queries = all.where($"vec_id" === 100L)
    def picks(lambda: Double): Seq[Long] =
      Mmr.mmrTopK(all.where($"vec_id" < 100L), queries,
          "vec_id", "embedding", k = 2, lambda = lambda, pool = 3)
        .orderBy($"rank").select($"neighbor_id").as[Long].collect().toSeq
    assert(picks(1.0) == Seq(1L, 2L))  // pure relevance keeps the near-dup
    assert(picks(0.3) == Seq(1L, 3L))  // diversity term evicts it
  }

  test("distributed fold matches the driver-side greedy reference") {
    val rng = new scala.util.Random(5)
    val cands = (0L until 40L).map(i =>
      (i, Array.fill(12)(rng.nextGaussian())))
    val queryIds = Seq(200L, 201L, 202L)
    val queryVecs = queryIds.map(i => (i, Array.fill(12)(rng.nextGaussian())))
    val df = (cands ++ queryVecs)
      .map { case (i, v) => (i, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val got = Mmr.mmrTopK(df.where($"vec_id" < 200L), df.where($"vec_id" >= 200L),
        "vec_id", "embedding", k = 4, lambda = 0.6, pool = 12)
      .select($"query_id", $"rank", $"neighbor_id", $"mmr")
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq)
      .toMap
    for ((qid, qv) <- queryVecs) {
      val want = refMmr(qv, cands, k = 4, lambda = 0.6, pool = 12)
      val wantRounded = want.map { case (id, m) =>
        (id, BigDecimal(m).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      assert(got(qid) == wantRounded, s"query $qid")
    }
  }

  test("rank 1 is always the pure-relevance argmax") {
    val rng = new scala.util.Random(9)
    val df = (0L until 30L).map(i =>
        (i, Array.fill(8)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val q = df.where($"vec_id" < 3)
    val mmr1 = Mmr.mmrTopK(df, q, "vec_id", "embedding", k = 3,
        lambda = 0.5, pool = 8)
      .where($"rank" === 1).select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().toMap
    val brute1 = VectorOps.bruteForceTopK(df, q, "vec_id", "embedding", k = 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    assert(mmr1 == brute1)
  }

  test("selected ids are distinct and exactly k per query") {
    val rng = new scala.util.Random(13)
    val df = (0L until 25L).map(i =>
        (i, Array.fill(6)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val out = Mmr.mmrTopK(df, df.where($"vec_id" < 4), "vec_id", "embedding",
      k = 5, lambda = 0.7, pool = 10)
    val per = out.groupBy($"query_id")
      .agg(count(lit(1)).as("n"), countDistinct($"neighbor_id").as("d"))
      .as[(Long, Long, Long)].collect()
    assert(per.length == 4 && per.forall(r => r._2 == 5 && r._3 == 5))
  }

  test("rerank over an exhaustively-probed VecIndex pool picks the same ids as brute MMR") {
    val rng = new scala.util.Random(21)
    val df = (0L until 60L).map(i =>
        (i, Array.fill(8)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val q = df.where($"vec_id" < 3)
    val dir = java.nio.file.Files.createTempDirectory("graft_mmr_idx_").toString
    VecIndex.build(df, dir, nlist = 4, kmeansIters = 1)
    // exhaustive probe -> the pool is the exact relevance top-10; join
    // back to the vector table for candidate vectors (the scale shape)
    val pooled = VecIndex.topK(q, dir, k = 10, nprobe = 4)
      .select($"query_id", $"rank".as("rn"), $"neighbor_id".as("cand_id"),
        $"cos".as("rel"))
      .join(df.select($"vec_id".as("cand_id"),
        VectorOps.asDouble($"embedding").as("cvec")), Seq("cand_id"))
    val viaIndex = Mmr.rerank(pooled, k = 4, lambda = 0.6)
      .select($"query_id", $"rank", $"neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    val brute = Mmr.mmrTopK(df, q, "vec_id", "embedding", k = 4,
        lambda = 0.6, pool = 10)
      .select($"query_id", $"rank", $"neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(viaIndex == brute && viaIndex.nonEmpty)
  }

  test("a pool smaller than k stops early with no null picks") {
    val rng = new scala.util.Random(31)
    val df = (0L until 5L).map(i =>
        (i, Array.fill(4)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val out = Mmr.mmrTopK(df, df.where($"vec_id" === 0), "vec_id", "embedding",
      k = 10, lambda = 0.5, pool = 10) // only 4 candidates exist
    val rows = out.select($"rank", $"neighbor_id").as[(Long, Long)]
      .collect().sortBy(_._1)
    assert(rows.length == 4 && rows.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
  }
}
