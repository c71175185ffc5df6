package graft.vec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph-based ANN: greedy BEAM SEARCH over a k-NN neighbor graph —
  * the NSW/DiskANN search pattern (Malkov & Yashunin 2016, Subramanya
  * et al. "DiskANN" NeurIPS 2019), completing the engine's ANN tier
  * next to IVF (partition pruning), PQ/SQ8 (compression) and LSH
  * (banding): navigate from an entry point toward a query by repeatedly
  * expanding the current best `beam` nodes' neighbors.
  *
  * The single-machine formulation is a priority-queue walk per query;
  * the DISTRIBUTED formulation here advances ALL queries one hop per
  * round (synchronous beam expansion): each round is
  *   frontier ⋈ edges (shuffle on node) → anti-join visited →
  *   score vs the broadcast query set → per-query top-beam window,
  * so the cost is `iters` rounds of bounded joins — per query and
  * round at most `beam * degree` new scorings, state = the visited
  * set (<= beam * degree * iters rows per query), lineage truncated
  * per round. Iterations needed grow with the graph diameter
  * (~log N for NSW-ish degree), not with N.
  *
  * Deterministic end-to-end given the edge frame: min-id entry point,
  * ties on cosine break by node id — which is what makes the whole
  * search (not just an exhaustive twin) oracle-gateable.
  */
object GraphAnn {

  /** Beam-search the `edges` graph ((src_id, dst_id), e.g.
    * [[VectorOps.knnGraph]] output) for each query: returns
    * (query_id, rank, neighbor_id, cos) — top `k` of everything
    * VISITED, the query's own node excluded from the output (it may
    * still navigate). Entry = the minimum corpus id. */
  def beamSearch(vectors: DataFrame, edges: DataFrame, queries: DataFrame,
                 idCol: String, vecCol: String, k: Int, beam: Int,
                 iters: Int): DataFrame = {
    require(k >= 1 && beam >= k,
      s"beamSearch: need 1 <= k <= beam, got k=$k beam=$beam")
    require(iters >= 1, s"beamSearch: iters must be >= 1, got $iters")
    val nodes = vectors
      .select(col(idCol).cast("long").as("node"),
        VectorOps.asDouble(col(vecCol)).as("__nv"))
      .transform(graft.ops.Pins.pin)
    val q = queries
      .select(col(idCol).cast("long").as("query_id"),
        VectorOps.asDouble(col(vecCol)).as("__qv"))
      .transform(graft.ops.Pins.pin)
    val e = edges.select(col("src_id").cast("long").as("__src"),
      col("dst_id").cast("long").as("__dst"))
    def score(cands: DataFrame): DataFrame = cands
      .join(nodes, Seq("node"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("node"),
        VecExpressions.cosineSim(col("__qv"), col("__nv")).as("cos"))
    val entry = nodes.orderBy(col("node")).limit(1).select(col("node"))
    var visited = score(broadcast(q.select(col("query_id"))).crossJoin(entry))
      .transform(graft.ops.Pins.pin)
    var frontier = visited
    val perQuery = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("node"))
    for (_ <- 1 to iters) {
      val expanded = frontier
        .join(e, frontier("node") === col("__src"))
        .select(col("query_id"), col("__dst").as("node")).distinct()
      val fresh = expanded.join(visited.select(col("query_id"), col("node")),
        Seq("query_id", "node"), "left_anti")
      visited = visited.unionByName(score(fresh)).transform(graft.ops.Pins.pin)
      frontier = visited
        .withColumn("__rn", row_number().over(perQuery))
        .where(col("__rn") <= beam).drop("__rn")
    }
    visited
      .where(col("node") =!= col("query_id"))
      .withColumn("rank", row_number().over(perQuery))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("node").as("neighbor_id"),
        (round(col("cos"), 4) + lit(0.0)).as("cos"))
  }
}
