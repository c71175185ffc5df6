package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the step that turns near-dup
  * PAIRS (MinHash/SimHash/embedding outputs) into dedup CLUSTERS with a
  * canonical representative, completing the dedup story: pairs ->
  * clusters -> keep list.
  *
  * Algorithm: alternating big-star / small-star contraction (the
  * MapReduce-era two-phase algorithm; see "Connected Components in
  * MapReduce and Beyond", Kiveris et al., SOCC'14 — public literature).
  * Each round rewires every vertex's larger neighbors (large-star), then
  * its smaller neighbors (small-star), to the minimum of its neighborhood;
  * the edge set contracts to disjoint stars rooted at each component's
  * minimum id in O(log n) rounds. Every round is a groupBy + a
  * co-partitioned join on the vertex id — no driver-side graph, no
  * per-partition state.
  *
  * Why not min-label propagation: that converges in O(diameter) sweeps,
  * which is fine for the star-shaped graphs exact-dup clusters form but a
  * scale-killer on chain-shaped near-dup graphs (a 10k-link chain = 10k
  * shuffles). Star contraction handles both in a few dozen shuffles at
  * any corpus size.
  */
object ConnectedComponents {

  /** (id, cluster_id) for every vertex appearing in a non-self pair,
    * where cluster_id is the smallest vertex id in the component.
    *
    * Small graphs short-circuit to a driver-side union-find: the pair
    * list is usually MUCH smaller than the corpus (it is the output of
    * capped LSH banding, not the input data), and when the canonical
    * edge set fits `localThreshold` rows a single collect + union-find
    * replaces ~log2(n) contraction rounds of 4-6 Spark jobs each — the
    * same hybrid GraphFrames ships for its connected components. The
    * distributed path takes over above the threshold (or for non-integral
    * id types), so scale is never capped by the fast path; pass
    * `localThreshold = 0` to force contraction.
    *
    * Throws if the fixpoint is not reached within `maxIter` contraction
    * rounds: silently returning partial labels would keep multiple
    * representatives per component — invisible under-dedup. The default
    * budget of 50 rounds covers any graph up to ~2^50 vertices with wide
    * margin (rounds needed ≈ log2(n)). */
  def clusters(pairs: DataFrame, aCol: String, bCol: String,
               maxIter: Int = 50, localThreshold: Long = 1L << 20): DataFrame = {
    // localCheckpoint (not persist): an iterative frame's LINEAGE doubles
    // per round even when the data is cached, and analyzing/printing the
    // accumulated plan OOMs the driver after ~10 rounds. Checkpointing
    // truncates the plan to the materialized result each round. The pair
    // list is often an expensive subtree (a whole MinHash pipeline);
    // checkpoint it ONCE so the vertex scan and the first round don't
    // each recompute it.
    val p = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .where(col("u") =!= col("v"))
      .transform(graft.ops.Pins.pin)
    // all labeled vertices (self-pairs are dropped above; vertices outside
    // any pair are implicitly their own component and not listed — same
    // contract as the keep list)
    val vertices = p.select(col("u")).union(p.select(col("v")))
      .distinct().transform(graft.ops.Pins.pin)

    // canonical undirected edges oriented (u > v)
    var cur = p
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct().transform(graft.ops.Pins.pin)

    var iter = 0
    var curCount = cur.count()
    val idType = vertices.schema.head.dataType
    val integralId = idType == org.apache.spark.sql.types.LongType ||
      idType == org.apache.spark.sql.types.IntegerType ||
      idType == org.apache.spark.sql.types.ShortType
    if (integralId && curCount <= localThreshold) return clustersLocal(cur, idType)
    var converged = curCount == 0
    while (!converged && iter < maxIter) {
      // large-star: every vertex connects its LARGER neighbors to the
      // minimum of its closed neighborhood
      val sym = cur.union(cur.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val ls = sym.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
      // small-star: every remaining center connects its smaller neighbors
      // (and itself) to the minimum among them; ls is already oriented
      // u > v, so the center's smaller neighborhood is exactly its v-set
      val mins2 = ls.groupBy("u").agg(min("v").as("m"))
      val next = ls.join(mins2, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins2.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
        .distinct()
        .transform(graft.ops.Pins.pin)
      // fixpoint: the canonical edge set is unchanged. Both sides are
      // distinct, so equal counts + empty one-way difference <=> equal;
      // the previous round's count is reused and the difference probe is
      // a left-anti join (cheaper than except — no re-distinct), so the
      // check costs one count + one short-circuited anti join per round.
      val nextCount = next.count()
      converged = nextCount == curCount &&
        next.join(cur, Seq("u", "v"), "left_anti").isEmpty
      curCount = nextCount
      cur = next
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge in $maxIter contraction " +
        "rounds; raise maxIter")
    // fixpoint is a disjoint union of stars rooted at each component's
    // minimum: non-roots appear exactly once as u, roots only as v
    vertices
      .join(cur.withColumnRenamed("u", "id").withColumnRenamed("v", "root"),
        vertices("u") === col("id"), "left")
      .select(vertices("u").as("id"), coalesce(col("root"), vertices("u")).as("cluster_id"))
  }

  /** Driver-side union-find over a collected canonical edge set (u > v,
    * deduped, bounded by `localThreshold`). Union-by-min keeps each
    * root the component minimum, matching the contraction fixpoint
    * exactly; path compression keeps it near-linear. */
  private def clustersLocal(edges: DataFrame,
                            idType: org.apache.spark.sql.types.DataType): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val es = edges
      .select(col("u").cast("long"), col("v").cast("long"))
      .as[(Long, Long)].collect()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (u, v) =>
      val ru = find(u); val rv = find(v)
      if (ru != rv) { if (ru < rv) parent(rv) = ru else parent(ru) = rv }
    }
    val labels = es.iterator.flatMap { case (u, v) => Iterator(u, v) }
      .toArray.distinct.map(x => (x, find(x)))
    labels.toSeq.toDF("id", "cluster_id")
      .select(col("id").cast(idType).as("id"),
        col("cluster_id").cast(idType).as("cluster_id"))
  }

  /** Keep/drop verdict per near-dup vertex: the cluster representative
    * (min id) is kept, the rest are dropped. Documents that never appear
    * in a pair are implicitly kept and not listed. */
  def keepList(pairs: DataFrame, aCol: String, bCol: String,
               maxIter: Int = 50, localThreshold: Long = 1L << 20): DataFrame =
    clusters(pairs, aCol, bCol, maxIter, localThreshold)
      .withColumn("keep", col("id") === col("cluster_id"))

  /** Keep the BEST-scoring member per near-dup cluster instead of the
    * min-id representative — the production collapse rule when a quality
    * signal exists (keep the longest / highest-quality / most-central
    * copy, drop the rest). Ties and missing scores fall back to min id,
    * so the verdict is total and deterministic. Output:
    * (id, cluster_id, keep) over the paired vertices, like [[keepList]];
    * unpaired documents are implicitly kept and not listed.
    *
    * Cost on top of [[clusters]]: one join against the score frame on
    * the vertex id (pair lists are capped-LSH output — tiny next to the
    * corpus) and one window per cluster. */
  def keepBest(pairs: DataFrame, aCol: String, bCol: String,
               scores: DataFrame, idCol: String, scoreCol: String,
               maxIter: Int = 50, localThreshold: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cl = clusters(pairs, aCol, bCol, maxIter, localThreshold)
    val sc = scores.select(col(idCol).as("id"), col(scoreCol).as("__score"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("__score").desc_nulls_last, col("id"))
    cl.join(sc, Seq("id"), "left")
      .withColumn("keep", row_number().over(w) === 1)
      .select(col("id"), col("cluster_id"), col("keep"))
  }
}
