package graft.vec

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Orthogonal Procrustes alignment: planted-rotation recovery,
  * orthogonality of the learned map, hand-computed cross-covariance,
  * rank-deficiency rejection, and the align-then-mine composition with
  * Bitext. */
class AlignSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def randFrame(n: Int, d: Int, seed: Int) = {
    val rng = new scala.util.Random(seed)
    (1L to n.toLong).map(i => (i, Array.fill(d)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("crossCov matches the hand-computed X^T Y sums") {
    // pairs: x=(1,2) y=(3,4) and x=(5,6) y=(7,8)
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f)),
      (Array(5.0f, 6.0f), Array(7.0f, 8.0f))).toDF("x", "y")
    val m = Align.crossCov(df, "x", "y", dims = 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(m((0, 0)) == 1 * 3 + 5 * 7)   // 38
    assert(m((0, 1)) == 1 * 4 + 5 * 8)   // 44
    assert(m((1, 0)) == 2 * 3 + 6 * 7)   // 48
    assert(m((1, 1)) == 2 * 4 + 6 * 8)   // 56
  }

  test("crossCov fails loudly on vectors shorter than dims") {
    val df = Seq((Array(1.0f), Array(1.0f))).toDF("x", "y")
    val e = intercept[Exception] {
      Align.crossCov(df, "x", "y", dims = 4).collect()
    }
    assert(e.getMessage.contains("exceeds vector length") ||
      e.getCause != null)
  }

  test("procrustes recovers a planted rotation and is orthogonal") {
    val d = 8
    val x = randFrame(300, d, seed = 5)
    val r0 = Align.givens(d, Seq((0, 1, math.Pi / 6), (2, 3, math.Pi / 3),
      (4, 7, 1.1)))
    val pairs = Align.applyMap(x, "embedding", "y", r0)
      .select($"embedding".as("x"), $"y")
    val w = Align.procrustes(pairs, "x", "y", d)
    // recovery: W == R0 entrywise
    for (i <- 0 until d; j <- 0 until d)
      assert(math.abs(w(i)(j) - r0(i)(j)) < 1e-9, s"W($i)($j)")
    // orthogonality: W^T W == I
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(k => w(k)(i) * w(k)(j)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9)
    }
  }

  test("procrustes rejects a rank-deficient cross-covariance") {
    // all-zero target side -> M = 0 -> ill-posed
    val x = randFrame(20, 4, seed = 9)
    val pairs = Align.applyMap(x, "embedding", "y",
        Array.fill(4)(Array.fill(4)(0.0)))
      .select($"embedding".as("x"), $"y")
    val e = intercept[IllegalArgumentException] {
      Align.procrustes(pairs, "x", "y", 4)
    }
    assert(e.getMessage.contains("rank-deficient"))
  }

  test("align-then-mine: Bitext on aligned spaces recovers planted counterparts") {
    val d = 8
    val src = randFrame(80, d, seed = 11)
    val r0 = Align.givens(d, Seq((0, 5, 0.9), (1, 6, 2.0), (2, 3, 0.4)))
    // tgt space = rotated src with shifted ids: counterpart of i is i+1000
    val tgt = Align.applyMap(src, "embedding", "rot", r0)
      .select(($"vec_id" + 1000L).as("vec_id"), $"rot".as("embedding"))
    // unaligned mining misses: raw cosine across the rotation is noise;
    // aligned mining recovers the planted identity mapping
    val seed = Align.applyMap(src.limit(40), "embedding", "y", r0)
      .select($"embedding".as("x"), $"y")
    val w = Align.procrustes(seed, "x", "y", d)
    val alignedSrc = Align.applyMap(src, "embedding", "aligned", w)
      .select($"vec_id", $"aligned".as("embedding"))
    val mined = Bitext.minePairs(alignedSrc, tgt, "vec_id", "embedding",
      k = 3, minMargin = 1.0).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val correct = mined.count { case (s, t) => t == s + 1000L }
    assert(mined.length >= 60, s"should mine most rows, got ${mined.length}")
    assert(correct == mined.length,
      s"every mined pair must be the planted counterpart: $correct/${mined.length}")
  }
}
