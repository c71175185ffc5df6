package graft.vec

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Centroid silhouette: hand-computed geometry + separation ordering. */
class ClusterEvalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("silhouette matches hand-computed two-cluster geometry") {
    // cluster 0 at x ~ 0 (points -1, 1), cluster 1 at x ~ 10 (9, 11)
    // centroids: (0), (10). every point: a = 1, b = 9 or 11
    val df = Seq(
      (1L, Array(-1.0f), 0), (2L, Array(1.0f), 0),
      (3L, Array(9.0f), 1), (4L, Array(11.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = ClusterEval.silhouette(df, "vec_id", "embedding", "label", 1)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // cluster 0: a=1 both; b = 11 (for -1) and 9 (for 1) -> mean_b = 10
    assert(got(0L)._3 == 1.0 && got(0L)._4 == 10.0)
    // s = (11-1)/11 and (9-1)/9 -> mean = (10/11 + 8/9)/2 = 0.898990
    assert(got(0L)._5 == BigDecimal((10.0 / 11 + 8.0 / 9) / 2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(1L)._3 == 1.0)
  }

  test("well-separated clusters beat overlapping ones; degenerate point scores 0") {
    def blob(label: Int, cx: Double, ids: Range): Seq[(Long, Array[Float], Int)] =
      ids.map(i => (i.toLong,
        Array((cx + (i % 3) * 0.1).toFloat, ((i % 2) * 0.1).toFloat), label))
    val apart = (blob(0, 0, 1 to 20) ++ blob(1, 50, 21 to 40))
      .toDF("vec_id", "embedding", "label")
    val close = (blob(0, 0, 1 to 20) ++ blob(1, 0.2, 21 to 40))
      .toDF("vec_id", "embedding", "label")
    def overall(df: org.apache.spark.sql.DataFrame): Double =
      ClusterEval.silhouette(df, "vec_id", "embedding", "label", 2)
        .agg(org.apache.spark.sql.functions.avg("silhouette"))
        .as[Double].collect().head
    assert(overall(apart) > 0.9)
    assert(overall(close) < 0.5)
    // a point exactly on a shared centroid location: a=b=0 -> s=0
    val degen = Seq((1L, Array(0.0f), 0), (2L, Array(0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val d = ClusterEval.silhouette(degen, "vec_id", "embedding", "label", 1)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(d.forall(_._5 == 0.0))
  }

  test("silhouette rejects a single cluster and over-wide vectors") {
    val one = Seq((1L, Array(1.0f), 0), (2L, Array(2.0f), 0))
      .toDF("vec_id", "embedding", "label")
    intercept[IllegalArgumentException] {
      ClusterEval.silhouette(one, "vec_id", "embedding", "label", 1)
    }
    val wide = Seq((1L, Array(1.0f, 2.0f), 0), (2L, Array(2.0f, 3.0f), 1))
      .toDF("vec_id", "embedding", "label")
    intercept[IllegalArgumentException] {
      ClusterEval.silhouette(wide, "vec_id", "embedding", "label", 1)
    }
  }

  test("silhouette fails loudly on null labels and too-short vectors") {
    val nullLab = Seq(
      (1L, Array(1.0f), Some(0)), (2L, Array(2.0f), Some(1)),
      (3L, Array(3.0f), None: Option[Int]))
      .toDF("vec_id", "embedding", "label")
    val e = intercept[IllegalArgumentException] {
      ClusterEval.silhouette(nullLab, "vec_id", "embedding", "label", 1)
    }
    assert(e.getMessage.contains("null"))
    // a 1-wide vector in a dims=2 corpus: zip_with would null-pad it
    // silently — the scoring pass must raise instead
    val short = Seq(
      (1L, Array(1.0f, 1.0f), 0), (2L, Array(2.0f, 2.0f), 1),
      (3L, Array(3.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val thrown = intercept[Exception] {
      ClusterEval.silhouette(short, "vec_id", "embedding", "label", 2)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(thrown).exists(_.contains("vector size != dims")))
  }
}
