package graft.vec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Clustering quality evaluation: the centroid-based (simplified)
  * silhouette — per point, a = distance to its own cluster centroid,
  * b = distance to the nearest OTHER centroid, s = (b-a)/max(a,b);
  * averaged per cluster. The standard "are these clusters real"
  * check before trusting cluster-keyed curation (cluster caps,
  * split-by-cluster, prototype pruning).
  *
  * Scale shape: centroids come from ONE dimension-keyed aggregation
  * (key space = |clusters| * dims — schema-sized, map-side combined),
  * are collected to the driver (k-means-centroid discipline) and
  * re-enter the plan as literals, so the scoring pass is a row-local
  * projection (|clusters| distance kernels per row, summed in codegen
  * order) followed by one cluster-keyed aggregation. The full-pairwise
  * silhouette (O(n^2)) is deliberately NOT offered — at corpus scale
  * the centroid form is the one you can afford, and for k-means-style
  * partitions it's the same ordering. */
object ClusterEval {

  /** Per-cluster silhouette frame: label, n, mean_a (own-centroid
    * distance), mean_b (nearest-other-centroid distance), silhouette.
    * Distances are Euclidean over `dims`-wide vectors (cast to
    * double). Degenerate points with a = b = 0 score 0. Degenerate
    * INPUTS fail loudly instead of silently scoring null: a null (or
    * non-castable) cluster label is rejected on the centroid pass, and
    * any vector whose size != dims raises in the scoring pass (both
    * too-short — which zip_with would silently null-pad — and
    * too-wide). */
  def silhouette(df: DataFrame, idCol: String, vecCol: String,
                 labelCol: String, dims: Int): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val lab = col(labelCol).cast("long")
    val centRows = df
      .select(lab.as("__l"), posexplode(v).as(Seq("__d", "__v")))
      .groupBy(col("__l"), col("__d"))
      .agg(avg(col("__v")).as("__c"))
      .collect()
    require(!centRows.exists(_.isNullAt(0)),
      s"silhouette: null (or non-numeric) cluster label in '$labelCol' — " +
        "filter or assign labels before scoring")
    val cents: Map[Long, Array[Double]] = centRows
      .groupBy(_.getLong(0))
      .map { case (l, rows) =>
        val arr = new Array[Double](dims)
        rows.foreach { r =>
          val d = r.getInt(1)
          require(d < dims, s"vector wider than dims=$dims (index $d)")
          arr(d) = r.getDouble(2)
        }
        l -> arr
      }
    val labels = cents.keys.toSeq.sorted
    require(labels.size >= 2, "silhouette needs at least 2 clusters")
    def dist(c: Array[Double]): Column =
      // l2sq kernel: bit-identical index-ordered fold, codegen'd
      sqrt(VecExpressions.l2Sq(v, typedLit(c.toSeq)))
    val aCol = labels.tail
      .foldLeft(when(lab === labels.head, dist(cents(labels.head)))) {
        (acc, l) => acc.when(lab === l, dist(cents(l)))
      }
    val bCol = least(labels.map(l =>
      when(lab =!= l, dist(cents(l)))): _*)
    val s = when(greatest(aCol, bCol) > 0,
      (bCol - aCol) / greatest(aCol, bCol)).otherwise(lit(0.0))
    // row-local guard, no extra scan: a short vector would otherwise
    // null-pad through zip_with and silently drop out of the means
    val sGuarded = when(size(v) === dims, s).otherwise(
      raise_error(lit(s"silhouette: vector size != dims=$dims in " +
        s"'$vecCol' — validate embeddings before scoring")).cast("double"))
    df.select(lab.as("label"), aCol.as("__a"), bCol.as("__b"),
        sGuarded.as("__s"))
      .groupBy(col("label"))
      .agg(count(lit(1)).cast("long").as("n"),
        (round(avg(col("__a")), 6) + lit(0.0)).as("mean_a"),
        (round(avg(col("__b")), 6) + lit(0.0)).as("mean_b"),
        (round(avg(col("__s")), 6) + lit(0.0)).as("silhouette"))
  }
}
