package graft.vec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semi-supervised label propagation over a neighbor graph (Zhu &
  * Ghahramani 2002, hard-label majority variant): seed labels stay
  * CLAMPED; every other node takes, each synchronous round, the
  * majority label among its neighbors' current labels (ties to the
  * smallest label, so rounds are deterministic). The label-efficient
  * expansion step of corpus curation: hand-label a few thousand
  * documents, propagate over the kNN/near-dup graph, and the whole
  * corpus gets quality/domain labels without a trained model.
  *
  * Scale shape: per round ONE edge ⋈ labels join (shuffles only
  * (node, label) pairs — never vectors or text), one (node,
  * label)-keyed count, one per-node argmax window, one anti-join
  * against the seed set. Rounds needed ~ graph diameter of the
  * labeled components, not corpus size — the big-star/small-star CC
  * argument. Edges are symmetrized internally, so a directed kNN
  * graph ([[VectorOps.knnGraph]]) plugs in directly.
  */
object LabelProp {

  /** Propagate `rounds` synchronous rounds. `edges` are (src_id,
    * dst_id) pairs (direction ignored); `seeds` are (idCol, labelCol)
    * rows, clamped throughout. Returns (idCol, labelCol, is_seed) for
    * every node reachable from a seed within `rounds` hops (plus the
    * seeds); unreachable nodes have no row. Non-seed labels may
    * CHANGE between rounds as the neighborhood majority shifts — the
    * standard synchronous-update semantics. */
  def propagate(edges: DataFrame, seeds: DataFrame, idCol: String,
                labelCol: String, rounds: Int = 3): DataFrame = {
    require(rounds >= 1, s"propagate: rounds must be >= 1, got $rounds")
    val e = edges.select(col("src_id").as("__s"), col("dst_id").as("__d"))
    val und = e.union(e.select(col("__d").as("__s"), col("__s").as("__d")))
      .where(col("__s") =!= col("__d")).distinct()
    val seed = seeds.select(col(idCol).as("__id"), col(labelCol).as("__lab"))
      .distinct()
    val w = Window.partitionBy(col("__d"))
      .orderBy(col("__n").desc, col("__lab"))
    var labels = seed
    (1 to rounds).foreach { _ =>
      val votes = und
        .join(labels.select(col("__id").as("__s"), col("__lab")), Seq("__s"))
        .groupBy(col("__d"), col("__lab"))
        .agg(count(lit(1)).as("__n"))
      val propagated = votes
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
        .select(col("__d").as("__id"), col("__lab"))
        .join(seed.select(col("__id")), Seq("__id"), "left_anti")
      labels = seed.union(propagated)
    }
    labels
      .join(seed.select(col("__id"), lit(true).as("is_seed")),
        Seq("__id"), "left")
      .select(col("__id").as(idCol), col("__lab").as(labelCol),
        coalesce(col("is_seed"), lit(false)).as("is_seed"))
  }
}
