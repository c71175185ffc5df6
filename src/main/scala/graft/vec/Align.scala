package graft.vec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Orthogonal Procrustes embedding alignment (Schönemann 1966; the
  * supervised baseline of Conneau et al. ICLR 2018 "Word Translation
  * Without Parallel Data" / MUSE): given seed pairs (x, y) from two
  * embedding spaces, the orthogonal map W minimizing ||XW − Y||_F is
  * W = UVᵀ from the SVD of M = XᵀY. Rotating the source space into
  * the target space is the step BEFORE margin-based mining
  * ([[Bitext]]) when the two sides come from different encoders or
  * languages — align on a seed dictionary, then mine the full corpora.
  *
  * Scale shape: the data-sized work is ONE partial-aggregated global
  * agg keyed by the dimension pair — key space d², data-independent,
  * the [[Reduce.covMatrix]] discipline — so the seed-pair corpus
  * streams through once. The SVD runs driver-side on the d×d matrix
  * (one-sided Jacobi, deterministic, microseconds at d ≤ 1024);
  * application is a row-local projection with W as plan literals
  * (the [[Reduce.projectColumn]] pattern) — no shuffle, no UDF.
  */
object Align {

  /** Cross-covariance sums M = XᵀY over the first `dims` dimensions of
    * the seed pairs: (i, j, sxy) for all 0 <= i, j < dims — the one
    * data-sized aggregation behind [[procrustes]]. Uncentered by
    * convention (MUSE aligns normalized embeddings without centering).
    *
    * Shape: explode on the ROW dimension only (d rows per pair, each
    * carrying x_i and the y vector) and aggregate d sum expressions
    * per key — the d² products stay multiply-adds inside codegen
    * instead of materializing d² structs per pair (at d = 64 that
    * explode was 4096 objects/row and dominated the whole alignment,
    * 4.7 s → sub-second at sf0.1). Key space d, data-independent.
    * Fails loudly on vectors shorter than `dims` (the covMatrix
    * discipline — element_at past the end would silently null sums
    * under non-ANSI semantics). */
  def crossCov(pairs: DataFrame, srcVecCol: String, tgtVecCol: String,
               dims: Int): DataFrame = {
    require(dims >= 1, s"crossCov: dims must be >= 1, got $dims")
    def checked(c: Column) =
      when(size(c) >= lit(dims), VectorOps.asDouble(c))
        .otherwise(raise_error(concat(
          lit(s"crossCov: dims=$dims exceeds vector length "), size(c))))
    val sums = (0 until dims).map(j =>
      sum(col("__xi") * element_at(col("__y"), j + 1)).as(s"__s$j"))
    pairs
      .select(checked(col(srcVecCol)).as("__x"), checked(col(tgtVecCol)).as("__y"))
      .select(posexplode(slice(col("__x"), 1, dims)).as(Seq("__i", "__xi")),
        col("__y"))
      .groupBy(col("__i").as("i"))
      .agg(sums.head, sums.tail: _*)
      .select(col("i"), posexplode(array((0 until dims).map(j =>
        col(s"__s$j")): _*)).as(Seq("j", "sxy")))
  }

  /** The Procrustes rotation W = UVᵀ (row-major d×d: aligned = x·W)
    * from the seed pairs. Orthogonal but not necessarily proper (a
    * reflection is allowed, the standard Procrustes solution). Fails
    * on rank-deficient MᵀM (a singular value below `1e-12 · σmax`) —
    * alignment is ill-posed there and a silent answer would be wrong. */
  def procrustes(pairs: DataFrame, srcVecCol: String, tgtVecCol: String,
                 dims: Int): Array[Array[Double]] = {
    val m = Array.ofDim[Double](dims, dims)
    crossCov(pairs, srcVecCol, tgtVecCol, dims).collect().foreach { r =>
      m(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
    }
    val (u, v) = jacobiSvd(m)
    // W = U Vᵀ, row-major so aligned_j = sum_i x_i * W(i)(j)
    Array.tabulate(dims, dims)((i, j) =>
      (0 until dims).map(k => u(i)(k) * v(j)(k)).sum)
  }

  /** Apply a d×d map as plan literals: out_j = sum_i vec_i · w(i)(j).
    * Row-local codegen dot per output dim — the randomProject shape. */
  def applyMap(vectors: DataFrame, vecCol: String, outCol: String,
               w: Array[Array[Double]]): DataFrame = {
    val d = w.length
    val v = VectorOps.asDouble(col(vecCol))
    val comps = (0 until d).map { j =>
      VecExpressions.dotProduct(v, typedlit((0 until d).map(i => w(i)(j))))
    }
    vectors.withColumn(outCol, array(comps: _*))
  }

  /** A composition of Givens rotations as a d×d row-major matrix —
    * the standard way to build an exact known orthogonal map for
    * planted-rotation tests and oracle replays (each plane rotation
    * touches two coordinates with literal cos/sin entries). */
  def givens(d: Int, planes: Seq[(Int, Int, Double)]): Array[Array[Double]] = {
    val w = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    planes.foreach { case (p, q, theta) =>
      require(p >= 0 && q >= 0 && p < d && q < d && p != q,
        s"givens: bad plane ($p, $q) for d=$d")
      val c = math.cos(theta); val s = math.sin(theta)
      (0 until d).foreach { i =>
        val wp = w(i)(p); val wq = w(i)(q)
        w(i)(p) = c * wp - s * wq; w(i)(q) = s * wp + c * wq
      }
    }
    w
  }

  /** One-sided Jacobi SVD of a square matrix M = U Σ Vᵀ, returning
    * (U, V). Deterministic fixed sweep order; converges quadratically
    * (30 sweeps is far past machine precision for d <= 1024). */
  private[vec] def jacobiSvd(m: Array[Array[Double]]): (Array[Array[Double]], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone()) // columns of a converge to U·Σ
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val eps = 1e-15
    var sweep = 0
    var rotated = true
    while (sweep < 30 && rotated) {
      rotated = false
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          var app = 0.0; var aqq = 0.0; var apq = 0.0
          var i = 0
          while (i < d) {
            app += a(i)(p) * a(i)(p); aqq += a(i)(q) * a(i)(q)
            apq += a(i)(p) * a(i)(q); i += 1
          }
          if (math.abs(apq) > eps * math.sqrt(app * aqq)) {
            rotated = true
            val tau = (aqq - app) / (2.0 * apq)
            val t = math.signum(tau) / (math.abs(tau) + math.sqrt(1.0 + tau * tau))
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = c * t
            i = 0
            while (i < d) {
              val ap = a(i)(p); val aq = a(i)(q)
              a(i)(p) = c * ap - s * aq; a(i)(q) = s * ap + c * aq
              val vp = v(i)(p); val vq = v(i)(q)
              v(i)(p) = c * vp - s * vq; v(i)(q) = s * vp + c * vq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val sigma = Array.tabulate(d)(j =>
      math.sqrt((0 until d).map(i => a(i)(j) * a(i)(j)).sum))
    val smax = sigma.max
    require(smax > 0 && sigma.forall(_ > 1e-12 * smax),
      s"procrustes: rank-deficient cross-covariance (singular values " +
        s"${sigma.map(x => f"$x%.3g").mkString(", ")}) — alignment is ill-posed")
    val u = Array.tabulate(d, d)((i, j) => a(i)(j) / sigma(j))
    (u, v)
  }
}
