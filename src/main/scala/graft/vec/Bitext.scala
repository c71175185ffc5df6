package graft.vec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Margin-based parallel-pair mining (Artetxe & Schwenk, ACL 2019,
  * "Margin-based Parallel Corpus Mining with Multilingual Sentence
  * Embeddings" — the CCMatrix/LASER recipe): raw cosine is a bad
  * mining score because "hub" sentences are near everything, so each
  * candidate pair (x, y) is scored by its cosine RELATIVE to the two
  * sides' neighborhoods —
  *
  *   margin(x, y) = cos(x, y) / ((avgTopK(x→T) + avgTopK(y→S)) / 2)
  *
  * (the paper's "ratio" margin) — and pairs are kept when each side is
  * the other's best candidate by margin ("intersection" strategy).
  * This is THE alignment step of multilingual corpus construction: at
  * 100 TB scale it mines bitext from billions of crawled sentences per
  * language pair.
  *
  * Scale shape: everything downstream of candidate generation touches
  * only the candidate pair set (~N*k rows, three id-keyed shuffles —
  * by src, by tgt, then the mutual-best join). Candidate generation is
  * pluggable: [[marginScoresOver]] takes ANY scored pair set, so the
  * 100 TB path feeds candidates from the ANN tier (IVF / graph-ANN /
  * LSH buckets) instead of the exhaustive cross — exactly how the
  * paper scales (FAISS-compressed neighborhoods). The exhaustive
  * wrapper [[marginScores]] is the oracle-gateable validation mode,
  * same discipline as `q_x_ann_*_exhaustive`.
  */
object Bitext {

  /** Margin scores over the union of forward/backward top-k candidate
    * pairs, exhaustive candidate generation (validation mode — the
    * scale path composes [[marginScoresOver]] with an ANN candidate
    * feed). Returns (src_id, tgt_id, cos, margin); both scores full
    * precision, deterministic rank ties by id. */
  def marginScores(src: DataFrame, tgt: DataFrame, idCol: String,
                   vecCol: String, k: Int = 4): DataFrame =
    marginScoresOver(crossScores(src, tgt, idCol, vecCol), k)

  /** The margin computation over ANY scored candidate pair set
    * (src_id, tgt_id, cos) — a SUPERSET of the per-side top-k is fine
    * (extra pairs only widen the union kept). Per side the top-k mean
    * uses min(k, available) candidates, like the paper's FAISS run.
    * Ranks tie-break by the opposite id, so the result is a pure
    * function of the pair set. */
  def marginScoresOver(pairs: DataFrame, k: Int = 4): DataFrame = {
    require(k >= 1, s"marginScoresOver: k must be >= 1, got $k")
    val wf = Window.partitionBy(col("src_id"))
      .orderBy(col("cos").desc, col("tgt_id"))
    val wb = Window.partitionBy(col("tgt_id"))
      .orderBy(col("cos").desc, col("src_id"))
    // pinned: ranked feeds THREE consumers (both neighborhood means and
    // the kept-union filter) — left lazy, each consumer re-planned the
    // whole candidate generation (in exhaustive mode, the full cosine
    // cross join) plus both rank windows. Every consumer only reads
    // rows inside some side's top-k, so the kept-union filter moves
    // BEFORE the pin: the checkpointed frame is bounded by ~2*N*k rows
    // even when the candidate feed is the exhaustive N_src x N_tgt
    // cross product — without the pre-filter, exhaustive validation
    // runs materialized the whole cross product to executor block
    // storage where the lazy form streamed it.
    val ranked = pairs
      .withColumn("__rf", row_number().over(wf))
      .withColumn("__rb", row_number().over(wb))
      .where(col("__rf") <= k || col("__rb") <= k)
      .transform(graft.ops.Pins.pin)
    // per-side neighborhood means over the top-k candidates only —
    // vocabulary-sized frames (one row per id), partial-aggregated
    val avgF = ranked.where(col("__rf") <= k)
      .groupBy(col("src_id")).agg(avg(col("cos")).as("__af"))
    val avgB = ranked.where(col("__rb") <= k)
      .groupBy(col("tgt_id")).agg(avg(col("cos")).as("__ab"))
    ranked
      .join(avgF, "src_id").join(avgB, "tgt_id")
      .select(col("src_id"), col("tgt_id"), col("cos"),
        (col("cos") / ((col("__af") + col("__ab")) / lit(2.0))).as("margin"))
  }

  /** Mined pairs, "intersection" strategy: keep (x, y) iff y is x's
    * best candidate by margin AND x is y's best, and the margin clears
    * `minMargin` (the paper's mining threshold, ~1.06 for LASER).
    * Ties by the opposite id, so mining is deterministic. Returns
    * (src_id, tgt_id, cos, margin), at most one pair per src and per
    * tgt. */
  def minePairs(src: DataFrame, tgt: DataFrame, idCol: String,
                vecCol: String, k: Int = 4,
                minMargin: Double = 1.0): DataFrame =
    minePairsOver(marginScores(src, tgt, idCol, vecCol, k), minMargin)

  /** The intersection selection over any margin-scored pair set. */
  def minePairsOver(scored: DataFrame, minMargin: Double): DataFrame = {
    val bf = Window.partitionBy(col("src_id"))
      .orderBy(col("margin").desc, col("tgt_id"))
    val bb = Window.partitionBy(col("tgt_id"))
      .orderBy(col("margin").desc, col("src_id"))
    scored
      .withColumn("__bf", row_number().over(bf))
      .withColumn("__bb", row_number().over(bb))
      .where(col("__bf") === 1 && col("__bb") === 1 &&
        col("margin") >= lit(minMargin))
      .select(col("src_id"), col("tgt_id"), col("cos"), col("margin"))
  }

  /** Exhaustive cosine pair scores src × tgt (validation-scale only;
    * the tgt side is broadcast like [[VectorOps.bruteForceTopK]]'s
    * query batch — candidates stream, no shuffle of the big side). */
  def crossScores(src: DataFrame, tgt: DataFrame, idCol: String,
                  vecCol: String): DataFrame = {
    val s = src.select(col(idCol).as("src_id"),
        VectorOps.asDouble(col(vecCol)).as("__sv"))
      .repartition(col("src_id"))
    val t = tgt.select(col(idCol).as("tgt_id"),
      VectorOps.asDouble(col(vecCol)).as("__tv"))
    s.crossJoin(broadcast(t))
      .select(col("src_id"), col("tgt_id"),
        VectorOps.cosine(col("__sv"), col("__tv")).as("cos"))
  }
}
