package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SketchesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 3 "ingest batches" sharing a skewed key space
  private def batch(seed: Long): DataFrame = spark.range(4000).select(
    (col("id") % 4).cast("string").as("grp"),
    pmod(col("id") * 2654435761L + seed, lit(700L)).as("v"))

  test("HLL: merged per-batch sketches equal the one-shot global estimate") {
    val batches = Seq(batch(0), batch(1), batch(2))
    val perBatch = batches.map(b => Sketches.hllSketches(b, Seq("grp"), "v"))
    val merged = Sketches.hllMergedEstimate(perBatch, Seq("grp"))
      .as[(String, Long)].collect().toMap
    val global = Sketches.hllSketches(batches.reduce(_ unionAll _), Seq("grp"), "v")
      .select(col("grp"), hll_sketch_estimate(col("hll")).as("est"))
      .as[(String, Long)].collect().toMap
    assert(merged == global)
  }

  test("HLL: sparse mode is exact at small cardinality, close at large") {
    val exactSmall = spark.range(300).select(col("id").as("v"))
    val gotSmall = Sketches.hllSketches(exactSmall.withColumn("g", lit("a")),
        Seq("g"), "v")
      .select(hll_sketch_estimate(col("hll"))).head.getLong(0)
    assert(gotSmall == 300L)

    val big = spark.range(50000).select(col("id").as("v"), lit("a").as("g"))
    val gotBig = Sketches.hllSketches(big, Seq("g"), "v")
      .select(hll_sketch_estimate(col("hll"))).head.getLong(0)
    assert(math.abs(gotBig - 50000L) < 2500, s"estimate $gotBig off by > 5%")
  }

  test("heavyHitters: exact counts, exact membership vs the full GROUP BY") {
    // 1000 rows of key 1, 400 of key 2, uniform tail over 100 keys
    val skewed = spark.range(1000).select(lit(1L).as("k"))
      .unionAll(spark.range(400).select(lit(2L).as("k")))
      .unionAll(spark.range(2000).select(pmod(col("id"), lit(100L)).as("k")))
    val got = Sketches.heavyHitters(skewed, "k", support = 0.05)
      .as[(Long, Long)].collect().toMap
    val n = skewed.count()
    val want = skewed.groupBy("k").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > n * 0.05).as[(Long, Long)].collect().toMap
    assert(got == want)
    assert(got.contains(1L) && got.contains(2L))
    // tail keys (~20-34 rows each) must not appear
    assert(got.keySet.forall(k => k == 1L || k == 2L))
  }

  test("heavyHitters: no hitters -> empty frame with the right schema") {
    val uniform = spark.range(10000).select(col("id").as("k"))
    val got = Sketches.heavyHitters(uniform, "k", support = 0.01)
    assert(got.columns.toSeq == Seq("k", "cnt"))
    assert(got.count() == 0)
  }

  test("CMS: never underestimates, merge of halves equals the global build") {
    val left = batch(0)
    val right = batch(1)
    val merged = Sketches.cmsMerge(
      Sketches.cmsBytes(left, "v"), Sketches.cmsBytes(right, "v"))
    val global = Sketches.cmsBytes(left.unionAll(right), "v")
    val truth = left.unionAll(right).groupBy("v").agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect().toMap
    for (k <- truth.keys.take(50)) {
      val est = Sketches.cmsEstimate(merged, k)
      assert(est >= truth(k), s"CMS underestimated key $k: $est < ${truth(k)}")
      assert(est == Sketches.cmsEstimate(global, k),
        s"merged sketch diverges from global at key $k")
      // eps=1e-4 on 8000 rows: overestimate bound ~ 1 count
      assert(est <= truth(k) + 2, s"CMS overestimate too large at $k: $est vs ${truth(k)}")
    }
  }

  test("KLL: quantiles within rank-error bound, merge of halves covers the whole") {
    import spark.implicits._
    val n = 50000
    val df = (1 to n).map(_.toDouble).toDF("v").repartition(8)
    val sk = Sketches.kllBytes(df, "v", k = 200)
    // k=200 -> ~0.8% single-sided rank error; allow 2%
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = Sketches.kllQuantile(sk, q)
      assert(math.abs(est / n - q) < 0.02, s"q=$q est=$est")
    }
    assert(math.abs(Sketches.kllRank(sk, n / 2.0) - 0.5) < 0.02)
    // per-batch sketches merged = same answers within bound
    val lo = Sketches.kllBytes((1 to n / 2).map(_.toDouble).toDF("v"), "v")
    val hi = Sketches.kllBytes((n / 2 + 1 to n).map(_.toDouble).toDF("v"), "v")
    val merged = Sketches.kllMerge(lo, hi)
    assert(math.abs(Sketches.kllQuantile(merged, 0.5) / n - 0.5) < 0.02)
  }

  test("KLL: nulls and NaN skipped; empty sketch refuses quantiles") {
    import spark.implicits._
    val df = Seq(Some(1.0), None, Some(Double.NaN), Some(3.0)).toDF("v")
    val sk = Sketches.kllBytes(df, "v")
    val med = Sketches.kllQuantile(sk, 0.5)
    assert(med == 1.0 || med == 3.0)
    val empty = Sketches.kllBytes(Seq.empty[Option[Double]].toDF("v"), "v")
    intercept[IllegalArgumentException] { Sketches.kllQuantile(empty, 0.5) }
  }

  test("theta overlap: exact set algebra below the nominal-entries bound") {
    val a = spark.range(0, 300).select(col("id").as("k"))       // 0..299
    val b = spark.range(200, 500).select(col("id").as("k"))     // 200..499
    val got = Sketches.thetaOverlap(a, b, "k")
      .as[(Long, Long, Long, Long, Double)].collect()(0)
    assert(got == ((300L, 300L, 100L, 500L, 100.0 / 500.0)))
  }

  test("theta overlap: disjoint sets report zero intersection and jaccard") {
    val a = spark.range(0, 50).select(col("id").as("k"))
    val b = spark.range(100, 150).select(col("id").as("k"))
    val got = Sketches.thetaOverlap(a, b, "k")
      .as[(Long, Long, Long, Long, Double)].collect()(0)
    assert(got == ((50L, 50L, 0L, 100L, 0.0)))
  }
}
