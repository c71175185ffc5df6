package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class FusionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ranks(rows: (String, Long, Long)*) =
    rows.toDF("query_id", "id", "rank")

  test("rrf: doc ranked by both systems beats single-system toppers") {
    // doc 10: rank 2 + rank 2 -> 2/62; docs 11/12: rank 1 once -> 1/61
    val sysA = ranks(("q", 11L, 1L), ("q", 10L, 2L))
    val sysB = ranks(("q", 12L, 1L), ("q", 10L, 2L))
    val got = Fusion.rrf(Seq(sysA, sysB), k = 3)
      .orderBy("rank").select("id", "rrf_score")
      .as[(Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(10L, 11L, 12L)) // 11 before 12: id tiebreak
    assert(math.abs(got.head._2 - 2.0 / 62.0) < 5e-5)
  }

  test("rrf: per-query isolation and top-k cut") {
    val sysA = ranks(("q1", 1L, 1L), ("q1", 2L, 2L), ("q1", 3L, 3L),
      ("q2", 7L, 1L))
    val got = Fusion.rrf(Seq(sysA), k = 2)
    val q1 = got.where($"query_id" === "q1").select("id").as[Long].collect()
    assert(q1.toSeq == Seq(1L, 2L)) // rank 3 cut by k=2
    assert(got.where($"query_id" === "q2").count() == 1)
  }

  test("rrf: a single shared doc across three systems accumulates all parts") {
    val systems = Seq(1L, 2L, 3L).map(r => ranks(("q", 5L, r)))
    val got = Fusion.rrf(systems, k = 1)
      .select("rrf_score").as[Double].head()
    val expect = Seq(61.0, 62.0, 63.0).map(1.0 / _).sum
    assert(math.abs(got - expect) < 5e-5)
  }
}
