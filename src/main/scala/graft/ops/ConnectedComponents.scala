package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a pair list — the step that turns near-dup
  * PAIRS (MinHash/SimHash/embedding outputs) into dedup CLUSTERS with a
  * canonical representative, completing the dedup story: pairs ->
  * clusters -> keep list.
  *
  * Algorithm: iterative min-label propagation. Every vertex starts
  * labeled with its own id; each sweep relabels to the minimum label in
  * its closed neighborhood; fixpoint when no label changes. Each sweep is
  * one join + one aggregation, both shuffling on the vertex id — no
  * driver-side graph, no per-partition state, so it runs at corpus scale.
  * Sweeps needed = graph diameter; dedup graphs are near-star-shaped
  * (duplicates of one document), so this converges in a few sweeps —
  * `maxIter` guards the pathological chain.
  */
object ConnectedComponents {

  /** (id, cluster_id) for every vertex appearing in `pairs`, where
    * cluster_id is the smallest vertex id in the component.
    *
    * Throws if the fixpoint is not reached within `maxIter` sweeps
    * (diameter > maxIter): silently returning partial labels would keep
    * multiple representatives per component — invisible under-dedup.
    * Raise `maxIter` for pathologically chain-shaped graphs. */
  def clusters(pairs: DataFrame, aCol: String, bCol: String,
               maxIter: Int = 50): DataFrame = {
    // localCheckpoint (not persist): an iterative frame's LINEAGE doubles
    // per sweep even when the data is cached, and analyzing/printing the
    // accumulated plan OOMs the driver after ~10 sweeps. Checkpointing
    // truncates the plan to the materialized result each round.
    // the pair list is often an expensive subtree (a whole MinHash
    // pipeline); checkpoint it ONCE so the two direction-unions below
    // don't each recompute it
    val p = pairs.select(col(aCol), col(bCol)).localCheckpoint()
    val edges = p.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(p.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK) // static across sweeps
    edges.count()

    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()

    var iter = 0
    var converged = false
    // maxIter + 1 total sweeps: labels stabilize after `diameter` sweeps
    // and one MORE sweep is needed to observe zero changes, so a graph
    // with diameter == maxIter must still be allowed its confirmation
    // sweep (the scaladoc contract is "throws if diameter > maxIter")
    while (!converged && iter <= maxIter) {
      // min label over the closed neighborhood: own label + each
      // neighbor's current label
      val neighborLabels = edges
        .join(labels.withColumnRenamed("id", "dst")
          .withColumnRenamed("label", "n_label"), Seq("dst"))
        .select(col("src").as("id"), col("n_label").as("cand"))
      val next = labels
        .select(col("id"), col("label").as("cand"))
        .union(neighborLabels)
        .groupBy("id").agg(min("cand").as("label"))
        .localCheckpoint()
      val changed = next.join(labels.withColumnRenamed("label", "old"), Seq("id"))
        .where(col("label") =!= col("old")).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge in $maxIter sweeps " +
        "(component diameter exceeds maxIter); raise maxIter")
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** Keep/drop verdict per near-dup vertex: the cluster representative
    * (min id) is kept, the rest are dropped. Documents that never appear
    * in a pair are implicitly kept and not listed. */
  def keepList(pairs: DataFrame, aCol: String, bCol: String,
               maxIter: Int = 50): DataFrame =
    clusters(pairs, aCol, bCol, maxIter)
      .withColumn("keep", col("id") === col("cluster_id"))
}
