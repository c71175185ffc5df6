package graft.vec

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Margin-based bitext mining: hand-computed margins on known
  * geometry, hub suppression (the reason margin exists), mutual-best
  * intersection semantics, ANN-candidate-feed equivalence, layout
  * invariance. */
class BitextSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def frame(pts: (Long, Array[Float])*) =
    pts.toDF("vec_id", "embedding")

  private def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("margins match the hand-computed recurrence on unit vectors") {
    // src 1 = (1,0); src 2 = (0,1). tgt 10 = (1,0); tgt 11 = (.6,.8)
    val src = frame(1L -> v(1, 0), 2L -> v(0, 1))
    val tgt = frame(10L -> v(1, 0), 11L -> v(0.6, 0.8))
    val got = Bitext.marginScores(src, tgt, "vec_id", "embedding", k = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), r.getDouble(3)))).toMap
    // cos: (1,10)=1, (1,11)=.6, (2,10)=0, (2,11)=.8
    // avgF: src1=(1+.6)/2=.8, src2=(.8+0)/2=.4
    // avgB: tgt10=(1+0)/2=.5, tgt11=(.8+.6)/2=.7
    def m(c: Double, af: Double, ab: Double) = c / ((af + ab) / 2.0)
    assert(math.abs(got((1L, 10L))._2 - m(1.0, 0.8, 0.5)) < 1e-6)
    assert(math.abs(got((1L, 11L))._2 - m(0.6, 0.8, 0.7)) < 1e-6)
    assert(math.abs(got((2L, 10L))._2 - m(0.0, 0.4, 0.5)) < 1e-6)
    assert(math.abs(got((2L, 11L))._2 - m(0.8, 0.4, 0.7)) < 1e-6)
  }

  test("margin suppresses hubs that raw cosine would mine") {
    // tgt 10 is a hub: fairly close to BOTH srcs; tgt 11 is the
    // genuine translation of src 2 only. By raw cosine src 2 prefers
    // the hub (.95 vs .9); by margin the hub's inflated neighborhood
    // mean pushes it below the dedicated match.
    val src = frame(1L -> v(1, 0), 2L -> v(0, 1))
    val tgt = frame(
      10L -> v(math.sqrt(0.5), math.sqrt(0.5)), // hub: cos .707 to both
      11L -> v(0.1, 0.995))                     // near src 2 only
    val scored = Bitext.marginScores(src, tgt, "vec_id", "embedding", k = 2)
    val bySrc2 = scored.where($"src_id" === 2L)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val hub = bySrc2.find(_._1 == 10L).get
    val ded = bySrc2.find(_._1 == 11L).get
    assert(ded._3 > hub._3, s"margin must prefer the dedicated match: $bySrc2")
    val mined = Bitext.minePairs(src, tgt, "vec_id", "embedding", k = 2,
      minMargin = 0.0).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mined.contains((2L, 11L)))
  }

  test("intersection strategy keeps only mutual-best pairs, one per side") {
    val src = frame(1L -> v(1, 0), 2L -> v(0.9, 0.1), 3L -> v(0, 1))
    val tgt = frame(10L -> v(1, 0.05), 20L -> v(0.05, 1))
    val mined = Bitext.minePairs(src, tgt, "vec_id", "embedding", k = 2,
      minMargin = 0.0).collect()
    val pairs = mined.map(r => (r.getLong(0), r.getLong(1))).toSet
    // 3 srcs, 2 tgts: at most 2 pairs, each side at most once
    assert(mined.map(_.getLong(0)).distinct.length == mined.length)
    assert(mined.map(_.getLong(1)).distinct.length == mined.length)
    assert(pairs.contains((3L, 20L)))
    // src 1 and 2 both want tgt 10; only one survives the mutual best
    assert(pairs.count(p => p._2 == 10L) <= 1)
  }

  test("minMargin threshold filters mined pairs") {
    val src = frame(1L -> v(1, 0))
    val tgt = frame(10L -> v(1, 0), 11L -> v(0, 1))
    val all = Bitext.minePairs(src, tgt, "vec_id", "embedding", k = 2,
      minMargin = 0.0).count()
    val none = Bitext.minePairs(src, tgt, "vec_id", "embedding", k = 2,
      minMargin = 1e9).count()
    assert(all == 1 && none == 0)
  }

  test("ANN candidate feed reproduces the exhaustive mining when candidates cover top-k") {
    val rng = new scala.util.Random(7)
    val src = frame((1L to 60L).map(i =>
      (i, Array.fill(8)(rng.nextGaussian().toFloat))): _*)
    val tgt = frame((101L to 180L).map(i =>
      (i, Array.fill(8)(rng.nextGaussian().toFloat))): _*)
    val exhaustive = Bitext.minePairs(src, tgt, "vec_id", "embedding",
      k = 3, minMargin = 1.0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // candidate feed = per-side top-5 by cosine (a superset of top-3):
    // margins over it must mine the same pairs — the scale-path contract
    val pairs = Bitext.crossScores(src, tgt, "vec_id", "embedding")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val wf = Window.partitionBy(col("src_id"))
      .orderBy(col("cos").desc, col("tgt_id"))
    val wb = Window.partitionBy(col("tgt_id"))
      .orderBy(col("cos").desc, col("src_id"))
    val cand = pairs.withColumn("rf", row_number().over(wf))
      .withColumn("rb", row_number().over(wb))
      .where(col("rf") <= 5 || col("rb") <= 5)
      .select("src_id", "tgt_id", "cos")
    val viaCand = Bitext.minePairsOver(
      Bitext.marginScoresOver(cand, k = 3), minMargin = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaCand == exhaustive)
  }

  test("mining is layout-invariant") {
    val rng = new scala.util.Random(13)
    val src = frame((1L to 40L).map(i =>
      (i, Array.fill(6)(rng.nextGaussian().toFloat))): _*)
    val tgt = frame((201L to 250L).map(i =>
      (i, Array.fill(6)(rng.nextGaussian().toFloat))): _*)
    val a = Bitext.minePairs(src, tgt, "vec_id", "embedding", k = 4,
      minMargin = 1.0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).sortBy(_._1)
    val b = Bitext.minePairs(src.repartition(7), tgt.repartition(5),
      "vec_id", "embedding", k = 4, minMargin = 1.0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }
}
