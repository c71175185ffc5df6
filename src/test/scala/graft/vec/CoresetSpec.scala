package graft.vec

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** k-center greedy coreset: exact selection order on known geometry,
  * layout invariance, coverage property, assignment ties. */
class CoresetSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def frame(pts: (Long, Double)*) =
    pts.map { case (id, x) => (id, Array(x.toFloat, 0.0f)) }
      .toDF("vec_id", "embedding")

  test("selection order matches the greedy recurrence on a line") {
    // positions: 1 -> 0, 2 -> 10, 3 -> 1, 4 -> 9, 5 -> 5
    val df = frame(1L -> 0.0, 2L -> 10.0, 3L -> 1.0, 4L -> 9.0, 5L -> 5.0)
    val got = Coreset.kCenterGreedy(df, "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // seed = min id (1, at 0); farthest = 2 (d 100); then 5 (min-dist 25);
    // then tie d=1 between 3 and 4 -> id asc -> 3
    assert(got.toSeq == Seq((1L, 1L, 0.0), (2L, 2L, 100.0),
      (3L, 5L, 25.0), (4L, 3L, 1.0)))
  }

  test("selection is layout-invariant and dist sequence is non-increasing after rank 2") {
    val rng = new scala.util.Random(11)
    val pts = (1L to 200L).map(i => (i, Array.fill(8)(rng.nextGaussian().toFloat)))
    val df = pts.toDF("vec_id", "embedding")
    val a = Coreset.kCenterGreedy(df, "vec_id", "embedding", k = 8).collect()
    val b = Coreset.kCenterGreedy(df.repartition(13), "vec_id", "embedding", k = 8)
      .collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      b.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    val dists = a.drop(1).map(_.getDouble(2))
    dists.sliding(2).foreach { case Array(x, y) =>
      assert(y <= x + 1e-9, s"greedy radius must not increase: $x then $y")
    }
  }

  test("coverage: max assign dist equals the (k+1)th selection dist") {
    val rng = new scala.util.Random(3)
    val pts = (1L to 100L).map(i => (i, Array.fill(4)(rng.nextGaussian().toFloat)))
    val df = pts.toDF("vec_id", "embedding")
    val sel = Coreset.kCenterGreedy(df, "vec_id", "embedding", k = 6).collect()
    val centers = Coreset.kCenterGreedyCenters(df, "vec_id", "embedding", k = 5)
    assert(centers.map(_._1) == sel.take(5).map(_.getLong(1)).toSeq)
    val asg = Coreset.assign(df, "vec_id", "embedding", centers)
    // the farthest point from the 5 selected IS what greedy picks 6th
    val far = asg.orderBy(org.apache.spark.sql.functions.col("dist").desc,
      org.apache.spark.sql.functions.col("id")).limit(1).head()
    assert(far.getLong(0) == sel(5).getLong(1))
    assert(math.abs(far.getDouble(2) - sel(5).getDouble(2)) < 1e-6)
  }

  test("assign breaks exact ties toward the earlier-selected center") {
    val df = frame(1L -> 0.0, 2L -> 10.0, 3L -> 5.0)
    val centers = Seq(1L -> Seq(0.0, 0.0), 2L -> Seq(10.0, 0.0))
    val got = Coreset.assign(df, "vec_id", "embedding", centers)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 1L && got(2L) == 2L)
    assert(got(3L) == 1L, "equidistant point goes to the earlier center")
    intercept[IllegalArgumentException] {
      Coreset.kCenterGreedy(df, "vec_id", "embedding", k = 0)
    }
  }
}
