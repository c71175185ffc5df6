package graft.ops

import org.apache.spark.sql.functions._
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
    // both paths: driver union-find (small graph) and forced contraction
    for (th <- Seq(1L << 20, 0L)) {
      val got = ConnectedComponents.clusters(pairs, "id_a", "id_b",
          localThreshold = th)
        .as[(Long, Long)].collect().toMap
      assert(got == Map(
        1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
        10L -> 10L, 11L -> 10L, 12L -> 10L,
        20L -> 20L, 21L -> 20L), s"localThreshold=$th")
    }
  }

  test("10k-node chain converges in O(log n) rounds, far under the default budget") {
    // the adversarial shape for label propagation (diameter = n, i.e.
    // 10k sweeps); star contraction must close it in ~log2(n) rounds —
    // maxIter = 20 would throw loudly if it regressed to diameter-bound
    val n = 10000
    val pairs = (1 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("id_a", "id_b")
    val got = ConnectedComponents.clusters(pairs, "id_a", "id_b", maxIter = 20,
      localThreshold = 0)
    assert(got.count() == n)
    assert(got.where(col("cluster_id") =!= 1L).isEmpty)
  }

  test("non-convergence within maxIter throws instead of under-deduping") {
    val pairs = (1 until 16).map(i => (i.toLong, (i + 1).toLong))
      .toDF("id_a", "id_b") // needs more than one contraction round
    val e = intercept[IllegalStateException](
      ConnectedComponents.clusters(pairs, "id_a", "id_b", maxIter = 1,
        localThreshold = 0).count())
    assert(e.getMessage.contains("maxIter"))
    val ok = ConnectedComponents.clusters(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect()
    assert(ok.forall(_._2 == 1L))
  }

  test("random graphs match a driver-side union-find (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genEdges: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(2, 50)
      m <- Gen.choose(1, 100)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong); b <- Gen.choose(0L, n.toLong)
      } yield (a, b))
    } yield edges
    def unionFind(edges: List[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) if a != b =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      case _ => }
      // min-root labels for vertices appearing in a non-self pair
      edges.collect { case (a, b) if a != b => Seq(a, b) }.flatten
        .distinct.map(v => v -> find(v)).toMap
    }
    val prop = Prop.forAll(genEdges) { edges =>
      val df = edges.toDF("id_a", "id_b")
      // forced-contraction path; the local union-find path is itself the
      // oracle here, so exercising it would be circular
      val got = ConnectedComponents.clusters(df, "id_a", "id_b",
          localThreshold = 0)
        .as[(Long, Long)].collect().toMap
      got == unionFind(edges)
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(result.passed, result.status.toString)
  }

  test("keepList keeps exactly one representative per component") {
    val pairs = Seq((5L, 6L), (6L, 7L), (30L, 31L)).toDF("id_a", "id_b")
    val kl = ConnectedComponents.keepList(pairs, "id_a", "id_b")
      .as[(Long, Long, Boolean)].collect()
    assert(kl.count(_._3) == 2)                      // one keeper per cluster
    assert(kl.filter(_._3).map(_._1).toSet == Set(5L, 30L))
    assert(kl.filterNot(_._3).map(_._1).toSet == Set(6L, 7L, 31L))
  }

  test("keepBest keeps the top-scoring member; ties and missing scores fall to min id") {
    val pairs = Seq((5L, 6L), (6L, 7L), (30L, 31L), (40L, 41L)).toDF("id_a", "id_b")
    val scores = Seq(5L -> 10.0, 6L -> 99.0, 7L -> 50.0,
      30L -> 3.0, 31L -> 3.0).toDF("doc_id", "quality")
    // cluster {40,41} has NO scores at all -> min id wins
    val kb = ConnectedComponents.keepBest(pairs, "id_a", "id_b",
        scores, "doc_id", "quality")
      .as[(Long, Long, Boolean)].collect()
    assert(kb.filter(_._3).map(_._1).toSet == Set(6L, 30L, 40L))
    assert(kb.count(_._3) == 3)
    assert(kb.length == 7) // every paired vertex gets a verdict
  }
}
