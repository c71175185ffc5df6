package graft.vec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98) —
  * diversified top-k retrieval: greedily pick the candidate maximizing
  *
  *   mmr(c) = lambda * rel(c) - (1 - lambda) * max_{s in S} sim(c, s)
  *
  * where S is the already-selected set. The RAG re-ranking step that
  * keeps a context window from being k near-copies of the same
  * passage.
  *
  * Execution shape: the greedy loop is INHERENTLY sequential in k, but
  * only WITHIN one query — so the operator stays fully distributed by
  * making the per-query loop row-local. Stage 1 scores a bounded
  * candidate pool per query (broadcast queries, candidates stream
  * once — the [[VectorOps.bruteForceTopK]] shape; swap in an ANN probe
  * for the pool at scale). Stage 2 collects the pool to ONE array per
  * query row (bounded by `pool`, a constant — never data-sized) and
  * runs the k greedy steps as an `aggregate` fold over array
  * expressions: no UDF, no driver loop, no shuffle beyond the pool
  * grouping. The same row-local-fold discipline as
  * `TextOps.chunkSentences`, and like it the fold is hash-gated
  * against a DuckDB oracle running the identical recurrence (unrolled,
  * since the config pins k).
  *
  * Pairwise similarity uses the [[VecExpressions.cosineSim]] codegen
  * kernel — bit-identical to DuckDB `list_cosine_similarity`'s
  * index-ordered fold, which is what lets the oracle argmax agree. */
object Mmr {

  /** Diversified top-k per query over a brute-force relevance pool.
    * `pool` bounds the relevance-ranked candidate set the greedy loop
    * reranks (the usual MMR recipe: retrieve pool >> k by relevance,
    * diversify within it). At corpus scale, source the pool from an
    * ANN probe instead and call [[rerank]] directly. */
  def mmrTopK(candidates: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              lambda: Double = 0.7, pool: Int = 10): DataFrame = {
    require(pool >= 1, s"mmrTopK: pool must be >= 1, got $pool")
    val cand = candidates.select(col(idCol).as("cand_id"),
        VectorOps.asDouble(col(vecCol)).as("cvec"))
      .repartition(col("cand_id"))
    val q = queries.select(col(idCol).as("query_id"),
      VectorOps.asDouble(col(vecCol)).as("q_vec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("cand_id"))
    val pooled = cand.crossJoin(broadcast(q))
      .where(col("cand_id") =!= col("query_id"))
      .withColumn("rel", VectorOps.cosine(col("cvec"), col("q_vec")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= pool)
    rerank(pooled, k, lambda)
  }

  /** The greedy diversification stage alone, over a caller-supplied
    * pool — THE SCALE PATH: feed it an ANN probe result (e.g.
    * [[VecIndex.topK]] joined back to the vector table) so the
    * relevance stage never brute-scans the corpus. `pooled` needs
    * (query_id, cand_id, rel, cvec) plus `rn` — the per-query
    * relevance rank that makes the collected array order canonical.
    * Per-query pools must be bounded (they ride one row each). */
  def rerank(pooled: DataFrame, k: Int, lambda: Double): DataFrame = {
    require(k >= 1, s"mmr rerank: k must be >= 1, got $k")
    require(lambda >= 0.0 && lambda <= 1.0,
      s"mmr rerank: lambda must be in [0,1], got $lambda")

    // one array row per query; sort by pool rank — collect_list order
    // is nondeterministic, the rank field makes it canonical
    val perQuery = pooled
      .groupBy(col("query_id"))
      .agg(array_sort(collect_list(
        struct(col("rn"), col("cand_id"), col("rel"), col("cvec")))).as("pool"))

    // greedy fold: acc is the selected list in pick order
    val accType = "array<struct<cand_id:bigint,mmr:double,cvec:array<double>>>"
    val selected = aggregate(
      sequence(lit(1), lit(k)),
      expr(s"CAST(array() AS $accType)"),
      (acc: Column, _: Column) => {
        val remaining = filter(col("pool"),
          c => !exists(acc, a => a("cand_id") === c("cand_id")))
        val scored = transform(remaining, c => struct(
          c("cand_id").as("cand_id"),
          (lit(lambda) * c("rel") - lit(1.0 - lambda) * coalesce(
            array_max(transform(acc,
              a => VecExpressions.cosineSim(c("cvec"), a("cvec")))),
            lit(0.0))).as("mmr"),
          c("cvec").as("cvec")))
        // argmax by (mmr desc, cand_id asc) via a comparator sort of the
        // BOUNDED pool array — O(pool log pool) on <= `pool` elements
        val best = element_at(array_sort(scored, (l, r) =>
          when(l("mmr") > r("mmr"), lit(-1))
            .when(l("mmr") < r("mmr"), lit(1))
            .when(l("cand_id") < r("cand_id"), lit(-1))
            .otherwise(lit(1))), 1)
        // a pool smaller than k just stops early (fewer picks), it
        // never emits null rows
        when(size(remaining) === 0, acc)
          .otherwise(concat(acc, array(best)))
      })

    perQuery.select(col("query_id"),
        posexplode(selected).as(Seq("pos", "pick")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("pick.cand_id").as("neighbor_id"),
        // + 0.0 folds IEEE -0.0 to +0.0: mmr can be negative, and a
        // value rounding to zero from below must hash like the oracle's
        (round(col("pick.mmr"), 4) + lit(0.0)).as("mmr"))
  }
}
