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
    val e0 = edges.select(col("src"), col("dst")).transform(graft.ops.Pins.pin)
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node")))
      .distinct()
      .repartition(col("node"))
      .transform(graft.ops.Pins.pin)
    val n = nodes.count()
    val outdeg = e0.groupBy(col("src"))
      .agg(count(lit(1)).cast("double").as("outdeg"))
    val e = e0.join(outdeg, "src").transform(graft.ops.Pins.pin)
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 0 until iters) {
      val contrib = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst").as("node"), (col("rank") / col("outdeg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("s"), lit(0.0))).as("rank"))
        .transform(graft.ops.Pins.pin)
    }
    ranks.select(col("node"), round(col("rank"), 6).as("pagerank"))
  }

  /** Per-node triangle counts over an undirected edge frame (src, dst) —
    * the local-clustering signal over a similarity graph: documents in
    * many triangles sit in tight semantic clumps (dedup/cluster
    * candidates), triangle-free nodes are stragglers.
    *
    * Degree-ordered distributed counting (the MapReduce-classic
    * Suri/Vassilvitskii shape): orient every edge from the lower to the
    * higher endpoint in the (degree, id) total order, build wedges by
    * self-joining out-edges, close them against the oriented edge set.
    * Orientation bounds every out-degree by O(sqrt(m)), so the wedge
    * join never explodes on hub nodes — the naive adjacency self-join is
    * degree-quadratic exactly where real graphs are hottest. Each
    * triangle is found exactly once (its lowest-order vertex builds the
    * wedge). Joins key on vertex ids; nothing is ever collected. */
  def triangles(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    val deg = und.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
    val aFirst = struct(col("da"), col("a")) < struct(col("db"), col("b"))
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("v"),
      when(aFirst, struct(col("db").as("d"), col("b").as("n")))
        .otherwise(struct(col("da").as("d"), col("a").as("n"))).as("ov"))
    val e1 = oriented.select(col("u"), col("v").as("x"), col("ov").as("ox"))
    val e2 = oriented.select(col("u"), col("v").as("y"), col("ov").as("oy"))
    val wedges = e1.join(e2, Seq("u")).where(col("ox") < col("oy"))
      .select(col("u"), col("x"), col("y"))
    val closures = oriented.select(col("u").as("x"), col("v").as("y"))
    val tri = wedges.join(closures, Seq("x", "y"))
    tri.select(explode(array(col("u"), col("x"), col("y"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_triangles"))
  }
}
