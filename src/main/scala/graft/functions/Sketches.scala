package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable sketch summaries — the incremental-statistics layer a 100 TB
  * store needs: per-batch sketches are tiny, linear (merge = union), and
  * answer corpus-wide questions WITHOUT rescanning old batches. A new
  * ingest updates global distinct counts / frequency estimates at
  * O(batch) cost; the exact alternative re-shuffles the full corpus per
  * refresh.
  *
  * - Distinct counts: DataSketches HLL via Spark's `hll_sketch_agg` /
  *   `hll_union_agg` (codegen'd aggs, binary sketch columns). Sparse-mode
  *   HLL is EXACT below ~2^(lgK-3) distinct values and within ~1.6% /
  *   sqrt(2^lgK) beyond.
  * - Frequency: count-min (one-sided overestimates, linear merge).
  * - Heavy hitters: EXACT top items in two narrow passes — a Misra-Gries
  *   candidate sweep (`stat.freqItems`, guaranteed superset, no shuffle of
  *   the key domain) then one tiny exact agg over candidates only. The
  *   single-pass exact `GROUP BY key HAVING count > s*N` shuffles every
  *   distinct key; this shuffles at most 1/support + 1 groups. */
object Sketches {

  // ------------------------------------------------------------------
  // HLL distinct
  // ------------------------------------------------------------------

  /** One HLL sketch per group over `valueCol` — the per-batch summary to
    * persist next to the batch. */
  def hllSketches(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lgK).as("hll"))

  /** Merge per-batch sketch frames (same group columns) into one estimate
    * per group — distinct-so-far without touching any batch's rows. */
  def hllMergedEstimate(batches: Seq[DataFrame], groupCols: Seq[String],
                        sketchCol: String = "hll"): DataFrame = {
    require(batches.nonEmpty, "hllMergedEstimate: no batches")
    batches.reduce(_ unionAll _)
      .groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col(sketchCol))).as("distinct_est"))
  }

  // ------------------------------------------------------------------
  // Exact heavy hitters, two narrow passes
  // ------------------------------------------------------------------

  /** Keys occurring in strictly more than `support` of `df`'s rows, with
    * exact counts. Pass 1: Misra-Gries candidates (superset guarantee at
    * half the final support — frequent keys cannot be missed). Pass 2:
    * exact counts for candidates + the total in ONE agg whose key space
    * is the candidate list, not the full key domain. */
  def heavyHitters(df: DataFrame, keyCol: String, support: Double): DataFrame = {
    require(support > 1e-4 && support < 1.0,
      s"heavyHitters: support must be in (1e-4, 1), got $support")
    val cands = df.stat.freqItems(Seq(keyCol), support / 2)
      .head.getSeq[Any](0)
    // non-candidates collapse into the NULL group, so the agg still sees
    // every row (the total) while keying at most 1/support + 1 groups
    val keyed = df.select(
      when(col(keyCol).isin(cands: _*), col(keyCol)).as("k"))
    val counts = keyed.groupBy("k").agg(count(lit(1)).as("cnt"))
    // global window over the tiny candidate frame (<= 1/support + 1 rows)
    counts.withColumn("__n", sum("cnt").over())
      .where(col("k").isNotNull && col("cnt") > col("__n") * support)
      .drop("__n")
  }

  // ------------------------------------------------------------------
  // Count-min frequency
  // ------------------------------------------------------------------

  /** Build a count-min sketch over `key` — overestimates by at most
    * eps * N with probability `confidence`, never underestimates. */
  def cmsBytes(df: DataFrame, key: String, eps: Double = 1e-4,
               confidence: Double = 0.99, seed: Int = 42): Array[Byte] =
    df.select(count_min_sketch(col(key), lit(eps), lit(confidence), lit(seed))
      .as("cms")).head.getAs[Array[Byte]](0)

  /** Linear merge: the sketch of a union is the cell-wise sum. Sketches
    * must share eps/confidence/seed. */
  def cmsMerge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val sa = CountMinSketch.readFrom(new ByteArrayInputStream(a))
    sa.mergeInPlace(CountMinSketch.readFrom(new ByteArrayInputStream(b)))
    val out = new java.io.ByteArrayOutputStream()
    sa.writeTo(out)
    out.toByteArray
  }

  /** Driver-side point estimate for one key. */
  def cmsEstimate(bytes: Array[Byte], item: Any): Long =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes)).estimateCount(item)

  // ------------------------------------------------------------------
  // KLL quantiles
  // ------------------------------------------------------------------

  /** KLL quantile sketch over `valueCol` (DataSketches KllDoublesSketch;
    * Agarwal et al. "Mergeable Summaries" lineage) — the third leg of
    * the mergeable-metadata trio: HLL answers distinct, count-min
    * answers frequency, KLL answers PERCENTILES across batches without
    * rescanning them. Rank error ~1.65/k single-sided (k=200 -> ~0.8%).
    *
    * Shape: one sketch per partition built in a streaming pass
    * (`mapPartitions`, no shuffle, one serialization per PARTITION —
    * never per row), merged driver-side; each sketch is a few KB. The
    * same mechanics as a 1000-executor cluster building per-task
    * sketches and reducing them. Nulls and NaNs are skipped. */
  def kllBytes(df: DataFrame, valueCol: String, k: Int = 200): Array[Byte] = {
    import org.apache.datasketches.kll.KllDoublesSketch
    val spark = df.sparkSession
    import spark.implicits._
    val parts = df.select(col(valueCol).cast("double").as("v"))
      .na.drop("any", Seq("v"))
      .as[Double]
      .mapPartitions { it =>
        val sk = KllDoublesSketch.newHeapInstance(k)
        it.foreach(v => if (!v.isNaN) sk.update(v))
        Iterator(sk.toByteArray)
      }(org.apache.spark.sql.Encoders.BINARY)
      .collect()
    val merged = KllDoublesSketch.newHeapInstance(k)
    parts.foreach(b => merged.merge(KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(b))))
    merged.toByteArray
  }

  /** Linear merge (union) of two KLL sketches. */
  def kllMerge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    import org.apache.datasketches.kll.KllDoublesSketch
    import org.apache.datasketches.memory.Memory
    val sa = KllDoublesSketch.heapify(Memory.wrap(a))
    sa.merge(KllDoublesSketch.heapify(Memory.wrap(b)))
    sa.toByteArray
  }

  /** Quantile estimate at rank q in [0, 1] (inclusive rule). */
  def kllQuantile(bytes: Array[Byte], q: Double): Double = {
    import org.apache.datasketches.kll.KllDoublesSketch
    import org.apache.datasketches.memory.Memory
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    require(!sk.isEmpty, "kllQuantile: empty sketch")
    sk.getQuantile(q)
  }

  /** Normalized rank of a value in [0, 1]. */
  def kllRank(bytes: Array[Byte], v: Double): Double = {
    import org.apache.datasketches.kll.KllDoublesSketch
    import org.apache.datasketches.memory.Memory
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    require(!sk.isEmpty, "kllRank: empty sketch")
    sk.getRank(v)
  }

  // ------------------------------------------------------------------
  // Theta set algebra
  // ------------------------------------------------------------------

  /** One theta sketch of `keyCol`'s distinct values: per-partition
    * sketches, driver union — each side of a set-overlap question costs
    * one narrow scan, no shuffle, and the result is a few KB. */
  def thetaBytes(df: DataFrame, keyCol: String, lgK: Int = 12): Array[Byte] = {
    import org.apache.datasketches.theta.{SetOperation, Sketches => DS}
    val spark = df.sparkSession
    import spark.implicits._
    val parts = df.select(col(keyCol).cast("string").as("k"))
      .na.drop("any", Seq("k"))
      .as[String]
      .mapPartitions { it =>
        val sk = org.apache.datasketches.theta.UpdateSketch.builder()
          .setLogNominalEntries(lgK).build()
        it.foreach(sk.update)
        Iterator(sk.compact().toByteArray)
      }(org.apache.spark.sql.Encoders.BINARY)
      .collect()
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    parts.foreach(b => u.union(DS.wrapSketch(
      org.apache.datasketches.memory.Memory.wrap(b))))
    u.getResult.toByteArray
  }

  /** Set-overlap estimates between two keyed corpora WITHOUT a join:
    * distinct counts per side, intersection, union, and Jaccard — the
    * "how much of corpus B have we already got" audit that exact
    * COUNT(DISTINCT) would answer with a full shuffle of both key sets.
    *
    * Theta sketches are EXACT below ~2^lgK retained keys and ~±1.6% /
    * sqrt(2^lgK) beyond (hence the oracle can gate this at test scale);
    * intersections inherit the worse of the two sides' modes. Each side
    * costs one narrow scan; the set algebra is driver-side on KB-sized
    * compact sketches. */
  def thetaOverlap(a: DataFrame, b: DataFrame, keyCol: String,
                   lgK: Int = 12): DataFrame = {
    import org.apache.datasketches.theta.{SetOperation, Sketches => DS}
    import org.apache.datasketches.memory.Memory
    val sa = DS.wrapSketch(Memory.wrap(thetaBytes(a, keyCol, lgK)))
    val sb = DS.wrapSketch(Memory.wrap(thetaBytes(b, keyCol, lgK)))
    val inter = SetOperation.builder().setLogNominalEntries(lgK).buildIntersection()
    inter.intersect(sa); inter.intersect(sb)
    val uni = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    uni.union(sa); uni.union(sb)
    val nI = inter.getResult.getEstimate
    val nU = uni.getResult.getEstimate
    val spark = a.sparkSession
    import spark.implicits._
    // raw IEEE division, no rounding: in exact mode both operands are
    // integral doubles, so any engine computing n_i/n_u bit-matches
    Seq((math.round(sa.getEstimate), math.round(sb.getEstimate),
        math.round(nI), math.round(nU),
        if (nU == 0.0) 0.0 else nI / nU))
      .toDF("n_a", "n_b", "n_intersect", "n_union", "jaccard")
  }
}
