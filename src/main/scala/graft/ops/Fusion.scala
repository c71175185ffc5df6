package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval: combine the ranked outputs of
  * heterogeneous searchers (lexical BM25, embedding ANN, ...) into one
  * list per query without score calibration — reciprocal-rank fusion
  * (Cormack et al., SIGIR 2009): each system contributes
  * 1 / (k0 + rank), summed per (query, doc).
  *
  * RRF is the standard hybrid-search combiner precisely because it only
  * consumes RANKS: BM25 scores and cosine similarities live on
  * incomparable scales, and reciprocal ranks need no normalization pass
  * over either. `k0 = 60` is the paper's constant.
  *
  * Scale shape: each input ranking is already top-k per query (tiny
  * relative to the corpus — the expensive work happened inside the
  * searchers), so the union + one (query_id, id) aggregation + one
  * per-query window are all bounded by queries * k * systems rows.
  */
object Fusion {

  /** Fuse ranked frames, each with columns (query_id, id, rank), into
    * (query_id, rank, id, rrf_score) — top `k` per query. Docs missing
    * from a system simply contribute nothing for it (no penalty term),
    * per the original formulation. */
  def rrf(rankings: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrf: need at least one ranking")
    require(k0 >= 1, s"rrf: k0 must be >= 1, got $k0")
    val contributions = rankings
      .map(_.select(col("query_id"), col("id"),
        (lit(1.0) / (lit(k0.toDouble) + col("rank").cast("double"))).as("part")))
      .reduce(_ unionByName _)
    val fused = contributions
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("part")).as("rrf"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"),
        round(col("rrf"), 4).as("rrf_score"))
  }
}
