package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Distributed eval metrics: AUC (ties, perfect/random/inverted),
  * calibration bins + ECE, precision/recall at k. */
class EvalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def auc(rows: (Double, Double)*): Double =
    Eval.auc(rows.toDF("s", "y"), "s", "y").head().getDouble(0)

  test("AUC: perfect, inverted, random and tied scorers") {
    assert(auc((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)) == 1.0)
    assert(auc((0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1)) == 0.0)
    // all scores identical -> average ranks -> 0.5 exactly
    assert(auc((0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)) == 0.5)
    // one tie pair straddling the classes counts half
    // pos ranks: 3.5 + 2 = 5.5 -> (5.5 - 3) / (2*2) = 0.625
    assert(auc((0.9, 1), (0.9, 0), (0.5, 1), (0.1, 0)) == 0.625)
  }

  test("AUC is layout-invariant and reports class sizes") {
    val df = (1 to 400).map { i =>
      val y = i % 2
      (y * 0.3 + (i % 17) / 40.0, y.toDouble)
    }.toDF("s", "y")
    val a = Eval.auc(df, "s", "y").head()
    val b = Eval.auc(df.repartition(13), "s", "y").head()
    assert(a.getDouble(0) == b.getDouble(0))
    assert(a.getLong(1) == 200 && a.getLong(2) == 200)
  }

  test("calibration bins edge cases: score 1.0 lands in the top bin") {
    val df = Seq((0.0, 0.0), (0.05, 0.0), (0.95, 1.0), (1.0, 1.0),
      (0.5, 1.0), (0.55, 0.0)).toDF("p", "y")
    val bins = Eval.calibration(df, "p", "y", bins = 10)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(bins(0)._1 == 2 && bins(0)._2 == 0.0)
    assert(bins(9)._1 == 2 && bins(9)._2 == 1.0)
    assert(bins(5)._1 == 2 && bins(5)._2 == 0.5)
    // ECE of a perfectly sharp scorer on these bins is small
    val rows = Eval.calibration(df, "p", "y", bins = 10).collect()
    val n = rows.map(_.getLong(1)).sum.toDouble
    val ece = rows.map(r => r.getLong(1) / n *
      math.abs(r.getDouble(3) - r.getDouble(2))).sum
    assert(ece >= 0.0 && ece < 0.2)
  }

  test("prAtK: known cut, recall complement, short-input k") {
    val df = Seq((1L, 0.9, 1.0), (2L, 0.8, 0.0), (3L, 0.7, 1.0),
      (4L, 0.6, 1.0), (5L, 0.5, 0.0)).toDF("id", "s", "y")
    val r = Eval.prAtK(df, "id", "s", "y", k = 3).head()
    assert(r.getLong(0) == 3 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 0.666667) // 2/3 rounded 6
    assert(r.getDouble(3) == 0.666667) // 2 of 3 positives
    // k beyond the frame: k reports the actual cut size
    val all = Eval.prAtK(df, "id", "s", "y", k = 50).head()
    assert(all.getLong(0) == 5 && all.getDouble(3) == 1.0)
  }

  // --------------------------------------- ranked-retrieval metrics

  private def rankRow(ranked: Seq[(Long, Long, Long)],
                      qrels: Seq[(Long, Long, Int)], k: Int) =
    Eval.rankMetrics(ranked.toDF("q", "rk", "d"), qrels.toDF("q", "d", "rel"),
        "q", "d", "rk", "rel", k)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(6),
          r.getDouble(7))).toMap

  test("rankMetrics: ideal ranking scores nDCG 1, misses score 0") {
    // q1: run returns the two relevant docs in ideal (rel-desc) order
    // q2: run finds nothing relevant; q3 in qrels only -> all-zero row
    val m = rankRow(
      ranked = Seq((1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 99L),
        (2L, 1L, 98L), (2L, 2L, 97L)),
      qrels = Seq((1L, 10L, 2), (1L, 11L, 1), (2L, 20L, 1), (3L, 30L, 2)),
      k = 10)
    assert(m(1L) == ((2L, 2L, 1.0, 1.0, 1.0)))
    assert(m(2L) == ((1L, 0L, 0.0, 0.0, 0.0)))
    assert(m(3L) == ((1L, 0L, 0.0, 0.0, 0.0)))
  }

  test("rankMetrics: hand-computed graded case with a late hit") {
    // rel-2 doc at rank 3, rel-1 doc at rank 1: ideal order is reversed
    val m = rankRow(
      ranked = Seq((7L, 1L, 5L), (7L, 2L, 6L), (7L, 3L, 4L)),
      qrels = Seq((7L, 4L, 2), (7L, 5L, 1)),
      k = 3)
    val dcg = 1.0 / (math.log(2) / math.log(2)) +
      3.0 / (math.log(4) / math.log(2))
    val idcg = 3.0 + 1.0 / (math.log(3) / math.log(2))
    val (nRel, nHit, rr, ndcg, recall) = m(7L)
    assert(nRel == 2 && nHit == 2 && rr == 1.0 && recall == 1.0)
    assert(math.abs(ndcg - dcg / idcg) < 1e-6)
  }

  test("rankMetrics respects the cutoff and rankSummary macro-averages") {
    val ranked = Seq((1L, 1L, 10L), (1L, 2L, 11L), (2L, 1L, 20L))
    val qrels = Seq((1L, 11L, 1), (2L, 20L, 1))
    // k=1 drops q1's rank-2 hit entirely
    val m1 = rankRow(ranked, qrels, k = 1)
    assert(m1(1L)._2 == 0L && m1(2L)._2 == 1L)
    val s = Eval.rankSummary(ranked.toDF("q", "rk", "d"),
        qrels.toDF("q", "d", "rel"), "q", "d", "rk", "rel", k = 2).head()
    // q1: rr 1/2, ndcg 1/2 (one rel-1 doc at rank 2: ideal has it at 1
    // -> dcg = 1/log2(3), idcg = 1), q2: all 1.0
    assert(s.getLong(0) == 2 && s.getLong(1) == 2)
    assert(s.getDouble(2) == 0.75) // mrr = (0.5 + 1) / 2
    val q1Ndcg = BigDecimal(1.0 / (math.log(3) / math.log(2)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(s.getDouble(3) - (q1Ndcg + 1.0) / 2) < 1e-6)
    assert(s.getDouble(4) == 1.0)
  }
}
