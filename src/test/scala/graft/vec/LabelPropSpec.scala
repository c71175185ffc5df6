package graft.vec

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Label propagation: hop-per-round reach, seed clamping, majority +
  * tie semantics, blob-recovery over a real kNN graph, layout
  * invariance. */
class LabelPropSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) =
    pairs.toDF("src_id", "dst_id")

  private def run(e: org.apache.spark.sql.DataFrame,
                  s: org.apache.spark.sql.DataFrame, rounds: Int) =
    LabelProp.propagate(e, s, "vec_id", "label", rounds)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap

  test("labels reach one hop per round along a chain") {
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)
    val s = Seq((1L, 7)).toDF("vec_id", "label")
    val r2 = run(e, s, rounds = 2)
    assert(r2 == Map(1L -> (7, true), 2L -> (7, false), 3L -> (7, false)))
    val r4 = run(e, s, rounds = 4)
    assert(r4.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(r4.values.map(_._1).toSet == Set(7))
  }

  test("seeds stay clamped against a hostile majority") {
    // node 1 seeded A but surrounded by three B seeds
    val e = edges(2L -> 1L, 3L -> 1L, 4L -> 1L, 1L -> 5L)
    val s = Seq((1L, 0), (2L, 1), (3L, 1), (4L, 1)).toDF("vec_id", "label")
    val got = run(e, s, rounds = 3)
    assert(got(1L) == ((0, true)))
    // node 5's only neighbor is the clamped node 1 -> takes A
    assert(got(5L) == ((0, false)))
  }

  test("majority wins; exact ties break to the smallest label") {
    val e = edges(10L -> 1L, 11L -> 1L, 12L -> 1L, 20L -> 2L, 21L -> 2L)
    val s = Seq((10L, 3), (11L, 3), (12L, 9), (20L, 9), (21L, 3))
      .toDF("vec_id", "label")
    val got = run(e, s, rounds = 1)
    assert(got(1L)._1 == 3) // 2 votes for 3, 1 for 9
    assert(got(2L)._1 == 3) // 1-1 tie -> smallest label
  }

  test("recovers planted blobs over a real kNN graph from few seeds") {
    val rng = new scala.util.Random(5)
    def blob(ids: Range, cx: Double) = ids.map(i => (i.toLong,
      Array.tabulate(8)(d => (rng.nextGaussian() * 0.2 +
        (if (d == 0) cx else 0.0)).toFloat)))
    val pts = blob(1 to 60, 5.0) ++ blob(61 to 120, -5.0)
    val df = pts.toDF("vec_id", "embedding")
    val e = VectorOps.knnGraph(df, "vec_id", "embedding",
      k = 4, nlist = 1, nassign = 1, kmeansIters = 0)
      .select("src_id", "dst_id")
    val seeds = Seq((1L, 0), (2L, 0), (61L, 1), (62L, 1))
      .toDF("vec_id", "label")
    val got = LabelProp.propagate(e, seeds, "vec_id", "label", rounds = 6)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.size >= 110, s"should reach nearly all nodes, got ${got.size}")
    val wrong = got.count { case (id, l) =>
      if (id <= 60) l != 0 else l != 1 }
    assert(wrong <= got.size / 20, s"$wrong/${got.size} mislabeled")
  }

  test("propagation is layout-invariant") {
    val e = edges((1L to 30L).flatMap(i => Seq(i -> (i % 30 + 1))): _*)
    val s = Seq((1L, 5), (15L, 8)).toDF("vec_id", "label")
    val a = run(e, s, 4).toSeq.sortBy(_._1)
    val b = LabelProp.propagate(e.repartition(7), s.repartition(3),
        "vec_id", "label", 4)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2)))
      .toSeq.sortBy(_._1)
    assert(a == b)
  }
}
