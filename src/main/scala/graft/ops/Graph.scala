package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-analysis centrality over an edge frame — the curation signal a
  * web-scale corpus builder derives from its link graph (domain/page
  * authority for source weighting) or, composed with
  * [[graft.vec.VectorOps.knnGraph]], from the semantic similarity graph
  * (central documents = semantic hubs; peripheral = outliers/noise —
  * both ends of the centrality spectrum are curation filters).
  */
object Graph {

  /** PageRank by fixed-iteration power method over edges (src, dst).
    * Deterministic: a pure function of the edge set, `iters` and
    * `damping` — no convergence test, so two engines produce the same
    * numbers (the oracle runs the identical recursion in SQL). Output:
    * (node, pagerank), ranks rounded to 6.
    *
    * Dangling vertices (no out-edges) leak their mass — the common
    * simplification; graphs from knnGraph have uniform out-degree k, so
    * nothing leaks there. Every iteration is one co-partitioned join of
    * the (localCheckpoint-pinned) edge frame with the current ranks on
    * `src` plus one hash aggregation on `dst` — map-side partial sums,
    * nothing node-quadratic, lineage truncated per round so plans stay
    * flat at any iteration count. Scale: both shuffles key on vertex
    * ids (uniform); hot dst vertices (celebrity pages) partial-combine
    * on the map side before the exchange. */
  def pagerank(edges: DataFrame, iters: Int = 3,
               damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"pagerank: iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"pagerank: damping must be in (0, 1), got $damping")
    val e0 = edges.select(col("src"), col("dst")).localCheckpoint()
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node")))
      .distinct()
      .repartition(col("node"))
      .localCheckpoint()
    val n = nodes.count()
    val outdeg = e0.groupBy(col("src"))
      .agg(count(lit(1)).cast("double").as("outdeg"))
    val e = e0.join(outdeg, "src").localCheckpoint()
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 0 until iters) {
      val contrib = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst").as("node"), (col("rank") / col("outdeg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("s"), lit(0.0))).as("rank"))
        .localCheckpoint()
    }
    ranks.select(col("node"), round(col("rank"), 6).as("pagerank"))
  }
}
