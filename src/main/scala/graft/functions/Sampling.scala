package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import scala.util.hashing.MurmurHash3

/** Deterministic bounded-memory column sampling: keep the k values with
  * the smallest MurmurHash3 of their string form (a bottom-k sketch — a
  * uniform sample that is stable across runs, partitionings, and
  * cluster sizes, unlike reservoir sampling with RNG state).
  *
  * Used by the metadata subsystem to attach example values per column
  * (`Store.columnStats(sampleK = ...)`): collect_list is unbounded
  * memory at 100 TB; this is O(k) per group in one pass and merges
  * associatively, so Catalyst plans it with map-side partials.
  */
object Sampling {

  final case class BottomKBuf(hashes: Seq[Long], values: Seq[String])

  final class BottomKByHash(k: Int)
      extends Aggregator[String, BottomKBuf, Seq[String]] {

    override def zero: BottomKBuf = BottomKBuf(Nil, Nil)

    private def insert(b: BottomKBuf, h: Long, v: String): BottomKBuf = {
      if (b.hashes.length >= k && h >= b.hashes.last) return b
      if (b.hashes.contains(h)) return b // dedup identical values
      val idx = b.hashes.indexWhere(_ > h) match {
        case -1 => b.hashes.length
        case i  => i
      }
      BottomKBuf(
        (b.hashes.take(idx) :+ h) ++ b.hashes.drop(idx).take(k - idx - 1),
        (b.values.take(idx) :+ v) ++ b.values.drop(idx).take(k - idx - 1))
    }

    override def reduce(b: BottomKBuf, a: String): BottomKBuf =
      if (a == null) b
      else insert(b, MurmurHash3.stringHash(a, 42).toLong & 0xffffffffL, a)

    override def merge(x: BottomKBuf, y: BottomKBuf): BottomKBuf =
      y.hashes.zip(y.values).foldLeft(x) { case (acc, (h, v)) => insert(acc, h, v) }

    override def finish(b: BottomKBuf): Seq[String] = b.values

    override def bufferEncoder: Encoder[BottomKBuf] = Encoders.product[BottomKBuf]
    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** Column form, usable inside any agg(...) alongside built-ins. */
  def bottomKSample(c: Column, k: Int): Column =
    udaf(new BottomKByHash(k)).apply(c.cast("string"))

  /** Deterministic stratified ROW sample: the k rows per stratum with the
    * smallest md5 of their id — the per-source / per-language balanced
    * slice a training-mix builder draws from a 100 TB corpus. md5 rank is
    * uniform AND engine-stable, so the selected set is reproducible
    * across runs, partitionings, cluster sizes, and engines (unlike
    * rand()-based sampling), and it composes: re-running with a larger k
    * extends the previous sample instead of replacing it (bottom-k sets
    * are nested).
    *
    * One shuffle on the stratum key; row_number is a streaming window
    * (no frame buffering). For pathologically hot strata the usual salt
    * (rank within (stratum, salt) at k/nSalts each, then re-rank the
    * survivors) bounds the per-task sort — the same discipline as
    * [[graft.ops.Skew.saltedAgg]].
    *
    * `idCol` MUST be unique within each stratum: duplicate ids tie on the
    * whole window ordering (md5(id), id), so which physical row wins the
    * tie would depend on partition scan order — determinism of the
    * selected ROW SET holds only when ids are unique. Callers with
    * duplicate ids should dedup first (or sample the id set, not rows). */
  def stratifiedSample(df: org.apache.spark.sql.DataFrame,
                       strataCols: Seq[String], idCol: String,
                       k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, md5, row_number}
    val rn = "__graft_stratified_rn"
    require(!df.columns.contains(rn), s"stratifiedSample: input already has a $rn column")
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn(rn, row_number().over(w))
      .where(col(rn) <= k)
      .drop(rn)
  }

  /** Deterministic training-mix draw: per-stratum TARGET COUNTS instead
    * of one global k — the domain-weighting step of a pre-training mix
    * ("30k docs of en, 10k of de, ..."). Same md5 bottom-k selection as
    * [[stratifiedSample]], so the same guarantees hold: reproducible
    * across runs/partitionings/engines, nested under growing targets,
    * requires `idCol` unique per stratum. Strata absent from `targets`
    * are dropped (an explicit mix is a whitelist); strata smaller than
    * their target return whole (callers wanting upsampling/epoch logic
    * own that policy — the engine stays a one-pass selector).
    *
    * One broadcast of the tiny target map, one shuffle on the stratum
    * key — identical cost shape to stratifiedSample. */
  def trainingMix(df: org.apache.spark.sql.DataFrame,
                  stratumCol: String, idCol: String,
                  targets: Map[String, Int]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{broadcast, col, md5, row_number}
    require(targets.nonEmpty, "trainingMix: empty target map")
    require(targets.values.forall(_ >= 0), "trainingMix: negative target count")
    val spark = df.sparkSession
    import spark.implicits._
    val rn = "__graft_mix_rn"
    val tk = "__graft_mix_k"
    require(!df.columns.contains(rn) && !df.columns.contains(tk),
      s"trainingMix: input already has a $rn/$tk column")
    // cast the target keys to the column's own type: joining a string
    // key frame against e.g. an int stratum column would otherwise
    // silently coerce both sides (and can miss matches)
    val targetDf = targets.toSeq.toDF(stratumCol, tk)
      .withColumn(stratumCol, col(stratumCol).cast(df.schema(stratumCol).dataType))
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.join(broadcast(targetDf), Seq(stratumCol))
      .withColumn(rn, row_number().over(w))
      .where(col(rn) <= col(tk))
      .drop(rn, tk)
  }

  /** 13-hex-digit threshold for cumulative fraction `c` in [0, 1): the
    * md5-prefix space is 16^13 = 2^52 values, so `floor(c * 2^52)` in
    * lowercase hex, zero-padded to 13 digits, splits it at exactly `c`
    * under plain STRING comparison (hex is order-preserving digit-wise).
    * Shared by [[splitAssign]] and its SQL oracle so both sides compare
    * against the identical literal. */
  def hexThreshold(c: Double): String = {
    require(c >= 0 && c < 1, s"hexThreshold: need 0 <= c < 1, got $c")
    f"${math.floor(c * 4503599627370496.0).toLong}%013x"
  }

  /** Deterministic train/val/test split assignment: each row gets the
    * label whose cumulative-fraction window contains its md5-prefix
    * uniform. Hash-based (not rand(), not row_number) because that is
    * the only split that survives a LIVING corpus: a document's
    * assignment depends on its OWN id alone, so re-running after docs
    * are added, removed, or re-partitioned never migrates an existing
    * doc across the split boundary — the property that keeps a held-out
    * set held out for the lifetime of the dataset. Comparison is a
    * plain string `<` on the 13-hex-digit md5 prefix against
    * [[hexThreshold]] literals: no float math anywhere, so any engine
    * with md5() reproduces the assignment bit-for-bit.
    *
    * Fractions must be positive and sum to 1 (the last label takes the
    * exact remainder, so rounding dust cannot drop rows). Pure codegen'd
    * projection — no shuffle, no state. */
  def splitAssign(df: org.apache.spark.sql.DataFrame, idCol: String,
                  splits: Seq[(String, Double)] =
                    Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
                  outCol: String = "split"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions.{col, lit, md5, substring, when}
    require(splits.nonEmpty, "splitAssign: empty split list")
    require(splits.forall(_._2 > 0), "splitAssign: fractions must be positive")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"splitAssign: fractions must sum to 1, got ${splits.map(_._2).sum}")
    require(splits.map(_._1).distinct.length == splits.length,
      "splitAssign: duplicate split labels")
    require(!df.columns.contains(outCol),
      s"splitAssign: input already has a $outCol column")
    val prefix = substring(md5(col(idCol).cast("string")), 1, 13)
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    var e: Column = lit(splits.last._1)
    for (i <- splits.length - 2 to 0 by -1)
      e = when(prefix < lit(hexThreshold(cums(i))), splits(i)._1).otherwise(e)
    df.withColumn(outCol, e)
  }

  /** Near-dup-aware split assignment: [[splitAssign]], but documents
    * connected by a near-duplicate pair are assigned AS A UNIT — the
    * whole dedup cluster hashes on its cluster id (minimum member id),
    * so two near-duplicates can never straddle the train/test boundary.
    * This closes the leakage channel by construction, where
    * [[graft.text.TextOps.splitLeakage]] merely reports it after the
    * fact. Documents in no pair assign by their own id, which keeps the
    * living-corpus stability property: adding a NEW doc never moves an
    * existing unpaired doc, and joining a cluster moves a doc only to
    * its cluster's (stable, min-id) split.
    *
    * `pairs` is the output of any near-dup detector (MinHash, SimHash,
    * embedding cosine). Cost: the connected-components run on the pair
    * list (small by construction — capped-LSH output, not the corpus)
    * plus ONE shuffle join of the corpus against the cluster map; the
    * split rule itself stays a pure projection. */
  def splitAssignByCluster(df: org.apache.spark.sql.DataFrame,
                           pairs: org.apache.spark.sql.DataFrame,
                           idCol: String,
                           aCol: String = "id_a", bCol: String = "id_b",
                           splits: Seq[(String, Double)] =
                             Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
                           outCol: String = "split"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col}
    require(!df.columns.contains("__skey") && !df.columns.contains("__cluster_id"),
      "splitAssignByCluster: input already has a __skey/__cluster_id column")
    val cl = graft.ops.ConnectedComponents.clusters(pairs, aCol, bCol)
      .select(col("id").as(idCol), col("cluster_id").as("__cluster_id"))
    val keyed = df.join(cl, Seq(idCol), "left")
      .withColumn("__skey", coalesce(col("__cluster_id"), col(idCol)))
    splitAssign(keyed, "__skey", splits, outCol).drop("__skey", "__cluster_id")
  }

  /** Token-BUDGET training-mix draw: instead of a row count per stratum
    * ([[trainingMix]]), each stratum gets a TOKEN budget — "20k tokens
    * of en, 5k of de" — the unit a pre-training mix is actually specified
    * in (model FLOPs consume tokens, not documents, and document length
    * varies by orders of magnitude). Rows are taken in the same
    * deterministic md5(id) order, and a row survives while the RUNNING
    * token total (inclusive of the row itself) stays within the budget:
    * a prefix rule, not a knapsack — once one document overflows the
    * budget, later (even smaller) documents are excluded too, which is
    * what keeps the selected set reproducible across engines and nested
    * under a growing budget (a larger budget only ever EXTENDS the
    * prefix). Strata absent from `budgets` are dropped (explicit mix =
    * whitelist); a row longer than its stratum's whole budget means that
    * stratum selects nothing from that row on.
    *
    * Cost shape identical to [[trainingMix]]: one broadcast of the tiny
    * budget map, one shuffle on the stratum key, one streaming window
    * (running sum needs no frame buffering). `idCol` must be unique per
    * stratum — same determinism caveat as every md5-ordered selector
    * here. */
  def tokenBudgetMix(df: org.apache.spark.sql.DataFrame,
                     stratumCol: String, idCol: String, tokensCol: String,
                     budgets: Map[String, Long]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{broadcast, col, md5, sum}
    require(budgets.nonEmpty, "tokenBudgetMix: empty budget map")
    require(budgets.values.forall(_ >= 0), "tokenBudgetMix: negative budget")
    val spark = df.sparkSession
    import spark.implicits._
    val cum = "__graft_mix_cum"
    val bd = "__graft_mix_budget"
    require(!df.columns.contains(cum) && !df.columns.contains(bd),
      s"tokenBudgetMix: input already has a $cum/$bd column")
    val budgetDf = budgets.toSeq.toDF(stratumCol, bd)
      .withColumn(stratumCol, col(stratumCol).cast(df.schema(stratumCol).dataType))
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.join(broadcast(budgetDf), Seq(stratumCol))
      .withColumn(cum, sum(col(tokensCol).cast("long")).over(w))
      .where(col(cum) <= col(bd))
      .drop(cum, bd)
  }

  /** Temperature-scaled training-mix draw: per-stratum targets derived
    * from the corpus counts as total * n_i^alpha / sum_j n_j^alpha — the
    * multilingual temperature-sampling rule (alpha = 1/T; mBERT/XLM-R
    * style, alpha in [0.3, 0.7] upweights low-resource strata relative
    * to their raw share; alpha = 1 is proportional, alpha = 0 uniform).
    * Selection reuses [[trainingMix]]'s md5 bottom-k, so the draw keeps
    * every determinism guarantee.
    *
    * Cross-engine reproducibility of the TARGETS: shares are snapped to
    * 6 decimals (round-half-up, DuckDB's round()) before the floor, so
    * last-ulp pow/sum differences between engines cannot flip a target;
    * alpha = 0.5 keeps the power itself exactly rounded on both sides
    * (IEEE sqrt) — other alphas ride Math.pow and stay deterministic
    * within the JVM, which is the guarantee that matters for re-runs.
    * Counts are collected driver-side (one row per stratum — tiny). */
  def temperatureMix(df: org.apache.spark.sql.DataFrame,
                     stratumCol: String, idCol: String,
                     total: Int, alpha: Double = 0.5): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit}
    require(total >= 0, s"temperatureMix: negative total $total")
    require(alpha >= 0, s"temperatureMix: negative alpha $alpha")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => String.valueOf(r.get(0)) -> r.getLong(1))
      .sortBy(_._1)
    require(counts.nonEmpty, "temperatureMix: empty input frame")
    val pows = counts.map { case (s, n) => s -> math.pow(n.toDouble, alpha) }
    val powSum = pows.map(_._2).sum
    val targets = pows.map { case (s, p) =>
      val share = math.floor(p / powSum * 1e6 + 0.5) / 1e6
      s -> math.floor(total * share + 1e-9).toInt
    }.toMap
    trainingMix(df, stratumCol, idCol, targets)
  }

  /** Deterministic WEIGHTED stratified sample — Efraimidis–Spirakis
    * A-Res ("Weighted random sampling with a reservoir", IPL 2006): per
    * stratum, keep the k rows with the largest u^(1/w), where u is a
    * uniform derived from md5(id) (the first 13 hex digits over 16^13 —
    * 52 bits, exactly representable in a double). Selection probability
    * rises with weight, the draw is reproducible across runs,
    * partitionings and engines (no rand()), sets are nested in k (keys
    * are fixed per row), and rows with non-positive weight are never
    * selected. The quality-weighted training-mix draw: weight by a
    * quality or LM score and heavy documents enter the mix more often,
    * without ever being guaranteed or excluded.
    *
    * Same cost shape as [[stratifiedSample]]: one stratum shuffle, one
    * streaming window. `idCol` must be unique per stratum (ties on the
    * full ordering would be layout-dependent). */
  def weightedSample(df: org.apache.spark.sql.DataFrame,
                     strataCols: Seq[String], idCol: String,
                     weightCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rn = "__graft_ws_rn"
    val key = "__graft_ws_key"
    require(!df.columns.contains(rn) && !df.columns.contains(key),
      s"weightedSample: input already has a $rn/$key column")
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 13), 16, 10)
      .cast("double") / math.pow(16.0, 13)
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(col(key).desc, md5(col(idCol).cast("string")), col(idCol))
    df.where(col(weightCol) > 0)
      .withColumn(key, pow(u, lit(1.0) / col(weightCol).cast("double")))
      .withColumn(rn, row_number().over(w))
      .where(col(rn) <= k)
      .drop(rn, key)
  }
}
