package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Distributed full-batch logistic regression: hash parity with the
  * scoring kernel, convergence on separable data, layout invariance,
  * and the oracle-gateable single-step frame. */
class TrainFullBatchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("builtin xxhash64 bucketing matches QualityKernels.bucket bit-for-bit") {
    val toks = Seq("the", "cat", "", "Straße", "日本語", "a b", "zz9")
    val viaSpark = toks.toDF("t")
      .select(col("t"), pmod(xxhash64(col("t")), lit(64L)).cast("int").as("j"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    toks.foreach { t =>
      assert(viaSpark(t) == QualityKernels.bucket(t, 64),
        s"bucket mismatch for '$t'")
    }
  }

  test("trainFullBatch separates an obvious vocabulary split") {
    val pos = (1L to 40L).map(i => (i, s"good clean prose number $i")).toDF("id", "text")
    val neg = (1L to 40L).map(i => (i, s"spam junk noise item $i")).toDF("id", "text")
    val m = QualityClassifier.trainFullBatch(pos, neg, "id", "text",
      dim = 256, iters = 40, lr = 1.0)
    val probe = Seq((1L, "good clean prose"), (2L, "spam junk noise"))
      .toDF("id", "text")
    val sc = QualityClassifier.score(probe, "id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sc(1L) > 0.9, s"positive-side doc scored ${sc(1L)}")
    assert(sc(2L) < 0.1, s"negative-side doc scored ${sc(2L)}")
  }

  test("training is layout-invariant") {
    val pos = Seq((1L, "alpha beta"), (2L, "alpha gamma"), (3L, "")).toDF("id", "text")
    val neg = Seq((1L, "delta beta"), (2L, "delta gamma")).toDF("id", "text")
    val a = QualityClassifier.trainFullBatch(pos, neg, "id", "text",
      dim = 32, iters = 5)
    val b = QualityClassifier.trainFullBatch(pos.repartition(7), neg.coalesce(1),
      "id", "text", dim = 32, iters = 5)
    a.weights.zip(b.weights).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-9, s"layout-dependent weight: $x vs $y")
    }
    assert(math.abs(a.bias - b.bias) < 1e-9)
  }

  test("l2 decays untouched weights; bad args rejected") {
    val pos = Seq((1L, "aa bb")).toDF("id", "text")
    val neg = Seq((1L, "cc dd")).toDF("id", "text")
    val m0 = QualityClassifier.trainFullBatch(pos, neg, "id", "text",
      dim = 16, iters = 3, l2 = 0.0)
    val m1 = QualityClassifier.trainFullBatch(pos, neg, "id", "text",
      dim = 16, iters = 3, l2 = 0.1)
    assert(m1.weights.map(math.abs).sum < m0.weights.map(math.abs).sum,
      "l2 must shrink the weight mass")
    intercept[IllegalArgumentException] {
      QualityClassifier.trainFullBatch(pos, neg, "id", "text", dim = 1)
    }
    intercept[IllegalArgumentException] {
      QualityClassifier.trainFullBatch(pos, neg, "id", "text", lr = 0.0)
    }
  }

  test("gradientStepFrame matches a hand-rolled driver-side step") {
    val model = QualityModel(8, Array(0.25, -0.5, 0.125, 0.75,
      -0.25, 0.0625, -0.125, 0.5), 0.0625)
    val rows = Seq(
      (1L, Seq("aa", "bb", "cc"), 1.0),
      (2L, Seq("dd", "ee"), 0.0),
      (3L, Seq("aa", "aa", "ff", "gg"), 1.0),
      (4L, Seq.empty[String], 0.0))
    val out = QualityClassifier.gradientStepFrame(
        rows.toDF("id", "toks", "y"), "toks", "y", model, lr = 0.5)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // reference: dense driver-side full-batch step over the same rows
    val w = model.weights.clone(); var gradB = 0.0
    val grad = new Array[Double](8)
    rows.foreach { case (_, toks, y) =>
      val js = toks.map(QualityKernels.bucket(_, 8))
      val margin = if (js.isEmpty) model.bias
        else js.map(w(_)).sum / js.length + model.bias
      val g = 1.0 / (1.0 + math.exp(-margin)) - y
      js.foreach { j => grad(j) += g / js.length }
      gradB += g
    }
    (0 until 8).foreach { j =>
      val expect = BigDecimal(w(j) - 0.5 * grad(j))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(out(j) - expect) < 1e-9, s"bucket $j: ${out(j)} vs $expect")
    }
    val expectB = BigDecimal(model.bias - 0.5 * gradB)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(-1) - expectB) < 1e-9)
    assert(out.size == 9, "one row per bucket plus the bias row")
  }
}
