package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("chains, stars and isolates resolve to min-id components") {
    // components: {1,2,3,4} via chain, {10,11,12} via star, {20,21}
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),      // chain (unordered pairs)
      (10L, 11L), (10L, 12L),            // star on 10
      (20L, 21L))
      .toDF("id_a", "id_b")
    val got = ConnectedComponents.clusters(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("long path converges within the diameter bound") {
    val n = 12
    val pairs = (1 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("id_a", "id_b")
    val got = ConnectedComponents.clusters(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect()
    assert(got.length == n && got.forall(_._2 == 1L))
  }

  test("non-convergence within maxIter throws instead of under-deduping") {
    val pairs = (1 until 8).map(i => (i.toLong, (i + 1).toLong))
      .toDF("id_a", "id_b") // diameter 7 > maxIter 3
    val e = intercept[IllegalStateException](
      ConnectedComponents.clusters(pairs, "id_a", "id_b", maxIter = 3).count())
    assert(e.getMessage.contains("maxIter"))
    // diameter exactly == maxIter converges (the confirmation sweep is
    // granted on top of the budget, per the documented contract)
    val ok = ConnectedComponents.clusters(pairs, "id_a", "id_b", maxIter = 7)
      .as[(Long, Long)].collect()
    assert(ok.forall(_._2 == 1L))
  }

  test("keepList keeps exactly one representative per component") {
    val pairs = Seq((5L, 6L), (6L, 7L), (30L, 31L)).toDF("id_a", "id_b")
    val kl = ConnectedComponents.keepList(pairs, "id_a", "id_b")
      .as[(Long, Long, Boolean)].collect()
    assert(kl.count(_._3) == 2)                      // one keeper per cluster
    assert(kl.filter(_._3).map(_._1).toSet == Set(5L, 30L))
    assert(kl.filterNot(_._3).map(_._1).toSet == Set(6L, 7L, 31L))
  }
}
