package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pagerank: the hub of a star collects the most mass") {
    // leaves 1..4 all point at hub 0; hub points back at leaf 1
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 1L))
      .toDF("src", "dst")
    val pr = Graph.pagerank(edges, iters = 5)
      .as[(Long, Double)].collect().toMap
    assert(pr(0L) > pr(1L) && pr(1L) > pr(2L)) // hub > backlinked leaf > plain leaf
    assert(pr(2L) == pr(3L) && pr(3L) == pr(4L)) // symmetric leaves tie exactly
    // no dangling vertices -> total mass is conserved at 1
    assert(math.abs(pr.values.sum - 1.0) < 1e-4)
  }

  test("pagerank: one iteration on a 2-cycle is exactly (1-d)/n + d/n") {
    val edges = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val pr = Graph.pagerank(edges, iters = 1, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    val expect = BigDecimal(0.15 / 2 + 0.85 * 0.5)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(pr(0L) == expect && pr(1L) == expect)
  }

  test("pagerank: dangling mass leaks (documented simplification)") {
    // 1 -> 0, and 0 has no out-edges: 0's mass is dropped each round
    val edges = Seq((1L, 0L)).toDF("src", "dst")
    val pr = Graph.pagerank(edges, iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(pr.values.sum < 1.0)
    assert(pr(0L) > pr(1L)) // the sink still collects 1's contribution
  }

  test("pagerank: deterministic across runs and partitionings") {
    val edges = spark.range(0, 300)
      .selectExpr("id AS src", "(id * 7 + 3) % 300 AS dst")
      .union(spark.range(0, 300).selectExpr("id AS src", "(id * 13 + 11) % 300 AS dst"))
    val a = Graph.pagerank(edges, iters = 3).as[(Long, Double)].collect().toMap
    val b = Graph.pagerank(edges.repartition(7), iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(a == b)
  }

  test("triangles: K4 has 4 triangles, every node in 3; squares have none") {
    // K4 on 0..3 plus a triangle-free square 10-11-12-13
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val square = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L))
    val got = Graph.triangles((k4 ++ square).toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("triangles: reversed duplicates and self-loops collapse before counting") {
    val edges = Seq(
      (1L, 2L), (2L, 1L),   // duplicate in both directions
      (2L, 3L), (3L, 1L),
      (1L, 1L))             // self-loop: dropped
      .toDF("src", "dst")
    val got = Graph.triangles(edges).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
