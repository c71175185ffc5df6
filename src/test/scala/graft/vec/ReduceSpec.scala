package graft.vec

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ReduceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol

  test("signMatrix is deterministic and +-1 valued") {
    val a = Reduce.signMatrix(16, 4, seed = 7)
    val b = Reduce.signMatrix(16, 4, seed = 7)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.flatten.forall(s => s == 1.0 || s == -1.0))
    // different seed must change at least one sign over 64 draws
    val c = Reduce.signMatrix(16, 4, seed = 8)
    assert(a.flatten.toSeq != c.flatten.toSeq)
  }

  test("randomProject matches the driver-side matrix product") {
    val vecs = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (1L, Array(-1.0f, 0.5f, 0.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val r = Reduce.signMatrix(4, 2, seed = 7)
    val got = Reduce.randomProject(vecs, "embedding", "proj", inDim = 4, outDim = 2)
      .select($"vec_id", $"proj").as[(Long, Seq[Double])].collect().toMap
    val in = Map(0L -> Array(1.0, 2.0, 3.0, 4.0), 1L -> Array(-1.0, 0.5, 0.0, 2.0))
    for ((id, v) <- in; j <- 0 until 2) {
      val want = (0 until 4).map(i => v(i) * r(j)(i)).sum / math.sqrt(2.0)
      assert(approx(got(id)(j), want), s"id=$id j=$j")
    }
  }

  test("randomProject is linear: P(a)+P(b) == P(a+b)") {
    val vecs = Seq(
      (0L, Array.tabulate(8)(i => i.toFloat)),
      (1L, Array.tabulate(8)(i => (8 - i).toFloat)),
      (2L, Array.fill(8)(8.0f))) // row 2 = row 0 + row 1
      .toDF("vec_id", "embedding")
    val p = Reduce.randomProject(vecs, "embedding", "proj", inDim = 8, outDim = 3)
      .select($"vec_id", $"proj").as[(Long, Seq[Double])].collect().toMap
    (0 until 3).foreach { j =>
      assert(approx(p(0L)(j) + p(1L)(j), p(2L)(j)))
    }
  }

  test("covMatrix matches a hand covariance") {
    val vecs = Seq(
      Tuple1(Array(1.0f, 2.0f)), Tuple1(Array(3.0f, 0.0f)),
      Tuple1(Array(5.0f, 4.0f)))
      .toDF("embedding")
    val got = Reduce.covMatrix(vecs, "embedding", dims = 2)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    // x = (1,3,5) mean 3 varp 8/3; y = (2,0,4) mean 2 varp 8/3; covp = 4/3
    assert(approx(got((0, 0)), 8.0 / 3))
    assert(approx(got((1, 1)), 8.0 / 3))
    assert(approx(got((0, 1)), 4.0 / 3))
    assert(got.size == 3) // upper triangle only
  }

  test("covMatrix fails loudly when dims exceeds the vector length") {
    val vecs = Seq(Tuple1(Array(1.0f, 2.0f))).toDF("embedding")
    val ex = intercept[Exception] {
      Reduce.covMatrix(vecs, "embedding", dims = 5).collect()
    }
    // raise_error surfaces (possibly wrapped by the task runner); the
    // message must name the mismatch rather than NPE-ing downstream
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("dims=5 exceeds vector length 2")))
  }

  test("jacobiEigen solves a known 2x2 exactly") {
    val (vals, vecs) = Reduce.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(approx(vals(0), 3.0) && approx(vals(1), 1.0))
    val s = 1.0 / math.sqrt(2.0)
    assert(approx(vecs(0)(0), s) && approx(vecs(0)(1), s))
    assert(approx(math.abs(vecs(1)(0)), s) && approx(math.abs(vecs(1)(1)), s))
    // canonical sign: largest-|coord| entry positive
    assert(vecs(1).maxBy(math.abs) > 0 || vecs(1)(vecs(1).indexWhere(v => math.abs(v) == vecs(1).map(math.abs).max)) > 0)
  }

  test("jacobiEigen: orthonormal eigenvectors that diagonalize A") {
    val rng = new scala.util.Random(11)
    val d = 6
    val base = Array.fill(d, d)(rng.nextGaussian())
    val a = Array.tabulate(d, d)((i, j) => (base(i)(j) + base(j)(i)) / 2)
    val (vals, vecs) = Reduce.jacobiEigen(a)
    // descending eigenvalues
    assert(vals.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    // orthonormality
    for (p <- 0 until d; q <- 0 until d) {
      val dot = (0 until d).map(k => vecs(p)(k) * vecs(q)(k)).sum
      assert(approx(dot, if (p == q) 1.0 else 0.0, 1e-8), s"V.VT at ($p,$q)")
    }
    // A v = lambda v
    for (p <- 0 until d; i <- 0 until d) {
      val av = (0 until d).map(k => a(i)(k) * vecs(p)(k)).sum
      assert(approx(av, vals(p) * vecs(p)(i), 1e-8), s"Av=lv at ($p,$i)")
    }
    // trace preserved
    assert(approx(vals.sum, (0 until d).map(i => a(i)(i)).sum, 1e-9))
  }

  test("pca finds the dominant axis of a line-shaped cloud") {
    // points along (0.6, 0.8) with tiny noise off-axis
    val pts = (0 until 50).map { i =>
      val t = (i - 25).toDouble
      Tuple1(Array((0.6 * t).toFloat, (0.8 * t).toFloat))
    }
    val df = pts.toDF("embedding")
    val model = Reduce.pca(df, "embedding", dims = 2)
    assert(approx(math.abs(model.components(0)(0)), 0.6, 1e-6))
    assert(approx(math.abs(model.components(0)(1)), 0.8, 1e-6))
    // sign canonical: largest-|coord| (index 1, 0.8) positive
    assert(model.components(0)(1) > 0)
    assert(model.eigenvalues(1) < 1e-9) // rank-1 cloud
    assert(model.explainedVariance(0) > 0.999)
  }

  test("pcaProject: per-component variance equals the eigenvalue, components decorrelated") {
    val rng = new scala.util.Random(5)
    val pts = (0 until 200).map { _ =>
      val a = rng.nextGaussian() * 3; val b = rng.nextGaussian()
      Tuple1(Array((a + b).toFloat, (a - b).toFloat, (0.5 * a).toFloat))
    }
    val df = pts.toDF("embedding").cache()
    val model = Reduce.pca(df, "embedding", dims = 3)
    val proj = Reduce.pcaProject(df, "embedding", "proj", model, k = 2)
      .select($"proj").as[Seq[Double]].collect()
    def varp(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    val c0 = proj.map(_(0)).toSeq; val c1 = proj.map(_(1)).toSeq
    assert(approx(varp(c0), model.eigenvalues(0), 1e-6 * model.eigenvalues(0) + 1e-9))
    assert(approx(varp(c1), model.eigenvalues(1), 1e-6 * model.eigenvalues(0) + 1e-9))
    val m0 = c0.sum / c0.size; val m1 = c1.sum / c1.size
    val cov01 = c0.zip(c1).map { case (x, y) => (x - m0) * (y - m1) }.sum / c0.size
    assert(approx(cov01, 0.0, 1e-6 * model.eigenvalues(0) + 1e-9))
    df.unpersist()
  }

  test("whitened projection has unit variance per component; zero-variance directions emit 0") {
    val rng = new scala.util.Random(9)
    val pts = (0 until 100).map { _ =>
      val a = rng.nextGaussian() * 4; val b = rng.nextGaussian()
      // third coord is a linear combo -> rank 2, eigenvalue ~0
      Tuple1(Array(a.toFloat, b.toFloat, (a + b).toFloat))
    }
    val df = pts.toDF("embedding").cache()
    val model = Reduce.pca(df, "embedding", dims = 3)
    val proj = Reduce.pcaProject(df, "embedding", "proj", model, k = 3, whiten = true)
      .select($"proj").as[Seq[Double]].collect()
    def varp(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    assert(approx(varp(proj.map(_(0)).toSeq), 1.0, 1e-6))
    assert(approx(varp(proj.map(_(1)).toSeq), 1.0, 1e-6))
    // the rank-deficient direction is guarded to 0, not blown up
    assert(model.eigenvalues(2) < 1e-9)
    assert(proj.forall(p => p(2) == 0.0))
    df.unpersist()
  }

  test("savePca/loadPca round-trips the model; projection identical") {
    val pts = (0 until 60).map { i =>
      val t = (i - 30).toDouble
      Tuple1(Array((0.6 * t).toFloat, (0.8 * t).toFloat))
    }
    val df = pts.toDF("embedding")
    val model = Reduce.pca(df, "embedding", dims = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_pca_model_").toString
    Reduce.savePca(spark, model, dir)
    val loaded = Reduce.loadPca(spark, dir)
    assert(loaded.means.toSeq == model.means.toSeq)
    assert(loaded.eigenvalues.toSeq == model.eigenvalues.toSeq)
    assert(loaded.components.map(_.toSeq).toSeq == model.components.map(_.toSeq).toSeq)
    val a = Reduce.pcaProject(df, "embedding", "proj", model, k = 1)
      .select($"proj").as[Seq[Double]].collect().toSeq
    val b = Reduce.pcaProject(df, "embedding", "proj", loaded, k = 1)
      .select($"proj").as[Seq[Double]].collect().toSeq
    assert(a == b)
  }
}
