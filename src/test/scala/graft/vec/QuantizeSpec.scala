package graft.vec

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class QuantizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecs3 = Seq(
    (0L, Array(0.0f, 10.0f, 5.0f)),
    (1L, Array(1.0f, 10.0f, 7.0f)),
    (2L, Array(2.0f, 10.0f, 9.0f)))
    .toDF("vec_id", "embedding")

  test("sq8Train learns exact per-dim ranges; constant dim is degenerate") {
    val m = Quantize.sq8Train(vecs3, "embedding", dims = 3)
    assert(m.mins.toSeq == Seq(0.0, 10.0, 5.0))
    assert(m.maxs.toSeq == Seq(2.0, 10.0, 9.0))
  }

  test("sq8 round trip: error bounded by half a quantization step") {
    val rng = new scala.util.Random(7)
    val data = (0L until 50L).map(i =>
      (i, Array.fill(8)((rng.nextDouble() * 4 - 2).toFloat)))
    val df = data.toDF("vec_id", "embedding")
    val m = Quantize.sq8Train(df, "embedding", dims = 8)
    val spans = m.mins.indices.map(i => m.maxs(i) - m.mins(i))
    val maxStep = spans.map(_ / 255.0 / 2.0).max
    val dq = df.select($"vec_id",
        Quantize.sq8Roundtrip($"embedding", m).as("dq"))
      .as[(Long, Seq[Double])].collect().toMap
    val orig = data.toMap
    for ((id, v) <- orig; i <- v.indices) {
      val err = math.abs(v(i).toDouble - dq(id)(i))
      assert(err <= maxStep + 1e-9, s"id=$id dim=$i err=$err")
    }
  }

  test("degenerate (constant) dimension reconstructs exactly") {
    val m = Quantize.sq8Train(vecs3, "embedding", dims = 3)
    val dq = vecs3.select(Quantize.sq8Roundtrip($"embedding", m).as("dq"))
      .as[Seq[Double]].collect()
    assert(dq.forall(v => v(1) == 10.0))
  }

  test("sq8Encode emits 0..255 codes and clamps out-of-range values") {
    val m = Quantize.sq8Train(vecs3, "embedding", dims = 3)
    val out = Seq((9L, Array(-5.0f, 10.0f, 100.0f))).toDF("vec_id", "embedding")
      .select(Quantize.sq8Encode($"embedding", m).as("codes"))
      .as[Seq[Int]].head()
    assert(out == Seq(0, 0, 255)) // below range -> 0; constant dim -> 0; above -> 255
    val codes = vecs3.select(Quantize.sq8Encode($"embedding", m).as("codes"))
      .as[Seq[Int]].collect()
    assert(codes.flatten.forall(c => c >= 0 && c <= 255))
  }

  test("sq8ReconError is ~0 on a corpus quantization represents exactly") {
    // values sit exactly on code points: x = mn + c*(mx-mn)/255 for int c
    val df = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(255.0f, 510.0f)),
      (2L, Array(51.0f, 102.0f)))
      .toDF("vec_id", "embedding")
    val m = Quantize.sq8Train(df, "embedding", dims = 2)
    val errs = Quantize.sq8ReconError(df, "vec_id", "embedding", m)
      .select($"l2_err").as[Double].collect()
    assert(errs.forall(_ < 1e-9))
  }

  test("sq8TopK recall vs brute force is high on random vectors") {
    val rng = new scala.util.Random(3)
    val df = (0L until 200L).map(i =>
        (i, Array.fill(16)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val m = Quantize.sq8Train(df, "embedding", dims = 16)
    val q = df.where($"vec_id" < 5)
    val approx = Quantize.sq8TopK(df, q, "vec_id", "embedding", k = 5, m)
    val exact = VectorOps.bruteForceTopK(df, q, "vec_id", "embedding", k = 5)
    assert(VectorOps.recallAtK(approx, exact) >= 0.8)
  }

  test("truncationOverlap: full dims give overlap 1.0; 1 dim degrades") {
    val rng = new scala.util.Random(11)
    val df = (0L until 100L).map(i =>
        (i, Array.fill(8)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val q = df.where($"vec_id" < 4)
    val full = Quantize.truncationOverlap(df, q, "vec_id", "embedding",
        k = 5, keepDims = 8)
      .select($"overlap").as[Double].collect()
    assert(full.forall(_ == 1.0))
    val one = Quantize.truncationOverlap(df, q, "vec_id", "embedding",
        k = 5, keepDims = 1)
      .select($"overlap").as[Double].collect()
    assert(one.length == 4 && one.exists(_ < 1.0))
  }
}
