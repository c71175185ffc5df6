package graft.vec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Coreset selection over an embedding column — k-center greedy
  * (Gonzalez 1985, the classic 2-approximation to the k-center cover;
  * the diversity-selection backbone of active-learning / data-pruning
  * coresets, Sener & Savarese ICLR 2018). Each step picks the point
  * FARTHEST from everything selected so far, so k points cover the
  * corpus at (provably near-minimal) radius — the geometric complement
  * of prototype pruning (which keeps cluster cores, while this keeps
  * the frontier).
  *
  * Scale shape: the selection loop is inherently sequential in k, but
  * each step is ONE distributed pass — a row-local min-distance
  * projection against the <= k selected centers (plan literals, the
  * MMR/chunkSentences discipline: bounded model state in the plan, no
  * join) followed by one global top-1 (TakeOrderedAndProject). Total
  * cost O(k) passes, O(N * k) distance kernels, driver state = k
  * centers. The recompute-from-literals form keeps every step
  * stateless (no checkpoint chain); for k in the hundreds the
  * incremental min-dist cache would pay — noted, not needed at the
  * k <= 64 coreset sizes this targets.
  */
object Coreset {

  /** The selected coreset: (rank, vec_id, dist) in selection order,
    * `dist` = squared-L2 distance to the nearest previously-selected
    * center at selection time (the coverage-radius sequence, non-
    * increasing in expectation; rank 1 — the deterministic min-id
    * seed — carries 0.0). Rounded to 4. */
  def kCenterGreedy(vectors: DataFrame, idCol: String, vecCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, s"kCenterGreedy: k must be >= 1, got $k")
    val spark = vectors.sparkSession
    import spark.implicits._
    val v = vectors.select(col(idCol).cast("long").as("id"),
        VectorOps.asDouble(col(vecCol)).as("v"))
      .transform(graft.ops.Pins.pin) // scanned k times; pin it once
    val first = v.orderBy(col("id")).limit(1).head()
    var picked = Vector[(Long, Seq[Double], Double)](
      (first.getLong(0), first.getSeq[Double](1), 0.0))
    while (picked.length < k) {
      val minDist = picked
        .map { case (_, c, _) => VectorOps.l2sq(col("v"), typedlit(c)) }
        .reduce(least(_, _))
      val sel = picked.map(_._1)
      val next = v.where(!col("id").isin(sel: _*))
        .select(col("id"), col("v"), minDist.as("d"))
        .orderBy(col("d").desc, col("id")).limit(1).head()
      picked = picked :+ ((next.getLong(0), next.getSeq[Double](1),
        next.getDouble(2)))
    }
    picked.zipWithIndex
      .map { case ((id, _, d), i) => (i + 1L, id, d) }
      .toDF("rank", "vec_id", "dist")
      .select(col("rank"), col("vec_id"),
        (round(col("dist"), 4) + lit(0.0)).as("dist"))
  }

  /** The k selected centers with their vectors (driver-held, k-bounded)
    * — for feeding [[assign]] without re-reading the corpus. */
  def kCenterGreedyCenters(vectors: DataFrame, idCol: String,
                           vecCol: String, k: Int): Seq[(Long, Seq[Double])] = {
    val sel = kCenterGreedy(vectors, idCol, vecCol, k)
      .select(col("vec_id")).collect().map(_.getLong(0))
    val byId = vectors
      .where(col(idCol).cast("long").isin(sel.toSeq: _*))
      .select(col(idCol).cast("long"), VectorOps.asDouble(col(vecCol)))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    sel.toSeq.map(id => id -> byId(id))
  }

  /** Coverage assignment: every point to its nearest selected center —
    * (id, center_id, dist), squared L2 rounded to 4, ties to the
    * earlier-selected center. Row-local argmin over the k centers as
    * plan literals (no join, no shuffle) — the downstream step that
    * turns a coreset into per-region quotas or pruning rules. */
  def assign(vectors: DataFrame, idCol: String, vecCol: String,
             centers: Seq[(Long, Seq[Double])]): DataFrame = {
    require(centers.nonEmpty, "assign: centers must be non-empty")
    val v = VectorOps.asDouble(col(vecCol))
    // fold in selection order so ties keep the earlier center
    val (seedId, seedVec) = centers.head
    val init = struct(lit(seedId).as("cid"), VectorOps.l2sq(v, typedlit(seedVec)).as("d"))
    val best = centers.tail.foldLeft(init) { case (acc, (cid, cvec)) =>
      val d = VectorOps.l2sq(v, typedlit(cvec))
      when(d < acc.getField("d"),
        struct(lit(cid).as("cid"), d.as("d"))).otherwise(acc)
    }
    vectors.select(col(idCol).cast("long").as("id"), best.as("__b"))
      .select(col("id"), col("__b.cid").as("center_id"),
        (round(col("__b.d"), 4) + lit(0.0)).as("dist"))
  }
}
