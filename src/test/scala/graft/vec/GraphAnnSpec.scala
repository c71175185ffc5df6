package graft.vec

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Beam search over a kNN graph: hand-checkable walk, recall vs brute
  * on the exact graph, layout invariance, self-exclusion. */
class GraphAnnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def unitVecs(n: Int, dims: Int, seed: Int) = {
    val rng = new scala.util.Random(seed)
    (1L to n.toLong).map { i =>
      val v = Array.fill(dims)(rng.nextGaussian().toFloat)
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      (i, v.map(_ / norm))
    }
  }

  test("a chain graph is navigated end to end by multi-hop expansion") {
    // 1-D line: node i at angle i — neighbors only adjacent, so reaching
    // the query's true neighbor REQUIRES walking, not one-hop scoring
    val pts = (1L to 8L).map { i =>
      val a = i * 0.2
      (i, Array(math.cos(a).toFloat, math.sin(a).toFloat))
    }
    val vecs = pts.toDF("vec_id", "embedding")
    val edges = (1L to 7L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
      .toDF("src_id", "dst_id")
    // query = node 8's position; entry = node 1 (min id), 7 hops away
    val q = Seq((8L, pts.last._2)).toDF("vec_id", "embedding")
    val got = GraphAnn.beamSearch(vecs, edges, q, "vec_id", "embedding",
      k = 1, beam = 2, iters = 7).collect()
    assert(got.length == 1)
    assert(got.head.getLong(2) == 7L, // own node excluded -> nearest other
      s"walk should reach node 7, got ${got.head.getLong(2)}")
    // too few iterations: the walk cannot have reached the far end
    val short = GraphAnn.beamSearch(vecs, edges, q, "vec_id", "embedding",
      k = 1, beam = 2, iters = 2).collect()
    assert(short.head.getLong(2) != 7L)
  }

  test("recall >= 0.9 vs brute force on the exact kNN graph; layout-invariant") {
    val vecs = unitVecs(150, 8, seed = 5).toDF("vec_id", "embedding")
    val queries = vecs.where(col("vec_id") <= 10)
    val edges = VectorOps.knnGraph(vecs, "vec_id", "embedding",
      k = 6, nlist = 1, nassign = 1).select(col("src_id"), col("dst_id"))
    val approx = GraphAnn.beamSearch(vecs, edges, queries, "vec_id",
      "embedding", k = 5, beam = 8, iters = 6)
    val exact = VectorOps.bruteForceTopK(vecs, queries, "vec_id",
      "embedding", k = 5)
    val r = VectorOps.recallAtK(approx, exact)
    assert(r >= 0.9, s"beam-search recall $r below 0.9")
    val again = GraphAnn.beamSearch(vecs.repartition(13), edges, queries,
      "vec_id", "embedding", k = 5, beam = 8, iters = 6)
    assert(approx.collect().map(_.toSeq).toSet ==
      again.collect().map(_.toSeq).toSet)
    // no query ever retrieves itself
    assert(approx.where(col("query_id") === col("neighbor_id")).count() == 0)
  }

  test("bad args rejected") {
    val vecs = unitVecs(5, 4, seed = 1).toDF("vec_id", "embedding")
    val edges = Seq((1L, 2L)).toDF("src_id", "dst_id")
    intercept[IllegalArgumentException] {
      GraphAnn.beamSearch(vecs, edges, vecs, "vec_id", "embedding",
        k = 5, beam = 2, iters = 1)
    }
    intercept[IllegalArgumentException] {
      GraphAnn.beamSearch(vecs, edges, vecs, "vec_id", "embedding",
        k = 1, beam = 2, iters = 0)
    }
  }
}
