package graft.vec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding dimensionality reduction — the step between raw encoder
  * output and the similarity machinery. At 100 TB the embedding columns
  * dominate storage and every downstream pairwise kernel (SemDeDup,
  * kNN graphs, IVF probes) pays per-dimension cost, so reducing 64 -> 16
  * dims before the quadratic stages is a 4x cut on the most expensive
  * arithmetic in the pipeline.
  *
  * Two reducers, both Spark-first:
  *
  *  - [[randomProject]]: a dense-sign random projection (Achlioptas,
  *    JCSS'03 — the database-friendly variant of Johnson-Lindenstrauss).
  *    The projection matrix is DATA-INDEPENDENT, derived from md5 so
  *    the DuckDB oracle can rebuild the exact same matrix in SQL and
  *    hash-match the output. The matrix is built once on the driver
  *    (outDim x inDim doubles — a few KB), embedded as plan literals,
  *    and applied row-local through the codegen dot kernel: no shuffle,
  *    no broadcast join, scales linearly with the corpus.
  *
  *  - [[pca]]: exact PCA via a one-pass distributed covariance
  *    aggregation ([[covMatrix]] — the only shuffle, keyed by dimension
  *    pair, key space d(d+1)/2 and data-independent) followed by a
  *    driver-side cyclic Jacobi eigendecomposition of the d x d matrix
  *    (d <= a few hundred: the matrix is dimension-sized, never
  *    data-sized). Projection is again row-local literals.
  *
  * Oracle strategy: the projection and the covariance entries are
  * hash-matched against DuckDB directly; the eigensolver is gated by the
  * trace identity (sum of eigenvalues == sum of per-dimension variances,
  * which DuckDB computes with var_pop) plus spec-level orthonormality /
  * diagonalization properties — the same kernel-twin discipline as
  * q_x_simhash_sig.
  */
object Reduce {

  // ------------------------------------------------------- sign matrix

  /** Deterministic +-1 from md5 of "rp:seed:i:j" — the top bit of the
    * first digest byte, i.e. first hex nibble in [0,8) => +1. DuckDB
    * twin: strpos('01234567', substr(md5(...), 1, 1)) > 0. */
  private[vec] def mdSign(seed: Int, i: Int, j: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rp:$seed:$i:$j".getBytes("UTF-8"))
    if ((h(0) & 0x80) == 0) 1.0 else -1.0
  }

  /** outDim rows of inDim signs; row j is output component j. */
  private[graft] def signMatrix(inDim: Int, outDim: Int, seed: Int): Array[Array[Double]] =
    Array.tabulate(outDim)(j => Array.tabulate(inDim)(i => mdSign(seed, i, j)))

  // -------------------------------------------------- random projection

  /** Project `vecCol` (array<float|double>, length `inDim`) to `outDim`
    * dims: out_j = dot(v, sign_j) / sqrt(outDim). Appends `outCol` as
    * array<double>; everything else passes through. Row-local, no
    * shuffle — the matrix rides in the plan as literals and the dot is
    * the whole-stage-codegen kernel. */
  def randomProject(vectors: DataFrame, vecCol: String, outCol: String,
                    inDim: Int, outDim: Int, seed: Int = 7): DataFrame =
    vectors.withColumn(outCol, projectColumn(col(vecCol), inDim, outDim, seed))

  /** The projection as a Column (also the `rp_project` SQL function). */
  def projectColumn(vec: Column, inDim: Int, outDim: Int, seed: Int = 7): Column = {
    require(inDim >= 1 && outDim >= 1,
      s"randomProject: dims must be >= 1, got inDim=$inDim outDim=$outDim")
    val r = signMatrix(inDim, outDim, seed)
    val v = VectorOps.asDouble(vec)
    val scale = math.sqrt(outDim.toDouble)
    val comps = (0 until outDim).map { j =>
      VecExpressions.dotProduct(v, typedlit(r(j).toSeq)) / lit(scale)
    }
    array(comps: _*)
  }

  // ---------------------------------------------- covariance (one pass)

  /** Population covariance of the first `dims` dimensions, upper
    * triangle: (i, j, cov) with 0 <= i <= j < dims. ONE global
    * aggregation keyed by the dimension pair — key space d(d+1)/2,
    * data-independent, partial-aggregated map-side; cov from the
    * single-pass sums (Sxy - Sx*Sy/n)/n, matching DuckDB covar_pop. The
    * pair explode is d(d+1)/2 rows per vector, bounded by the schema,
    * not the data. */
  def covMatrix(vectors: DataFrame, vecCol: String, dims: Int): DataFrame =
    covSums(vectors, vecCol, dims)
      .select(col("i").cast("int").as("i"), col("j").cast("int").as("j"),
        ((col("sxy") - col("sx") * col("sy") / col("n")) / col("n")).as("cov"))

  /** The single aggregation behind [[covMatrix]] and [[pca]]: per upper-
    * triangle pair (i, j) the sums (n, sxy, sx, sy). Diagonal rows carry
    * every per-dim sum, so means need no second scan. */
  private def covSums(vectors: DataFrame, vecCol: String, dims: Int): DataFrame = {
    require(dims >= 1, s"covMatrix: dims must be >= 1, got $dims")
    // numerical caveat: the single-pass (Sxy - Sx*Sy/n)/n form is
    // cancellation-prone when |mean| >> stddev (non-centered data);
    // it is kept because the DuckDB oracle computes the identical
    // expression, so both sides cancel identically
    vectors
      .select(VectorOps.asDouble(col(vecCol)).as("__v"))
      // fail loudly on short vectors: element_at past the end is null
      // under non-ANSI semantics, which would silently null sxy/sx/sy
      // while n keeps counting — wrong cov entries and an opaque NPE
      // downstream in pca's Row.getDouble
      .select(when(size(col("__v")) >= lit(dims), col("__v"))
        .otherwise(raise_error(concat(
          lit(s"covMatrix: dims=$dims exceeds vector length "),
          size(col("__v")).cast("string")))).as("__v"))
      .select(explode(expr(
        s"""flatten(transform(sequence(0, ${dims - 1}), i ->
              transform(sequence(i, ${dims - 1}), j ->
                struct(i AS i, j AS j,
                  element_at(__v, i + 1) AS xi,
                  element_at(__v, j + 1) AS xj))))""")).as("p"))
      .select(col("p.i"), col("p.j"),
        col("p.xi"), col("p.xj"), (col("p.xi") * col("p.xj")).as("xy"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"), sum(col("xy")).as("sxy"),
        sum(col("xi")).as("sx"), sum(col("xj")).as("sy"))
  }

  /** Pearson correlation matrix from the same single pass: corr(i,j) =
    * cov(i,j) / sqrt(var_i * var_j). The diagonal frame is d rows —
    * broadcast by construction; zero-variance dims yield NULL (matching
    * SQL corr), not a division blowup. */
  def corrMatrix(vectors: DataFrame, vecCol: String, dims: Int): DataFrame = {
    val cov = covMatrix(vectors, vecCol, dims)
    val diag = cov.where(col("i") === col("j"))
      .select(col("i").as("d"), col("cov").as("v"))
    cov
      .join(broadcast(diag.select(col("d").as("di"), col("v").as("vi"))),
        col("i") === col("di"))
      .join(broadcast(diag.select(col("d").as("dj"), col("v").as("vj"))),
        col("j") === col("dj"))
      .select(col("i"), col("j"),
        when(col("vi") > 0 && col("vj") > 0,
          col("cov") / sqrt(col("vi") * col("vj"))).as("corr"))
  }

  // -------------------------------------------------- Jacobi eigen (driver)

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix. Returns
    * (eigenvalues, eigenvectors) sorted by eigenvalue DESC, each
    * eigenvector sign-canonicalized (largest-|coord| entry positive) so
    * results are deterministic. Driver-side by design: the input is
    * d x d where d is the embedding dimensionality — schema-sized, the
    * same class as the k-means centroid and PQ codebook collects. */
  private[vec] def jacobiEigen(m0: Array[Array[Double]],
                               maxSweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val d = m0.length
    val a = Array.tabulate(d, d)((i, j) => m0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    // relative convergence: off-diagonal mass down to machine noise of
    // the matrix scale (off and fro2 are both sums of SQUARES)
    val fro2 = {
      var s = 0.0; var i = 0
      while (i < d) { var j = 0; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    val stopTol = 1e-26 * fro2
    val skipTol = 1e-15 * math.sqrt(fro2 / math.max(d, 1))
    var sweep = 0
    var off = offDiag(a)
    while (sweep < maxSweeps && off > stopTol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > skipTol) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // sgn(0) must be +1 here (equal diagonal => full 45-degree
            // rotation), so signum() — which returns 0 — would skip it
            val t = (if (theta >= 0) 1.0 else -1.0) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val eigVals = order.map(i => a(i)(i)).toArray
    val eigVecs = order.map { i =>
      val col = Array.tabulate(d)(k => v(k)(i))
      val pivot = col.indices.maxBy(k => (math.abs(col(k)), -k))
      if (col(pivot) < 0) col.map(-_) else col
    }.toArray
    (eigVals, eigVecs)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  // ------------------------------------------------------------- PCA

  /** PCA model over the first `dims` dimensions: per-dim means,
    * components (rows, eigenvalue-DESC, sign-canonical), eigenvalues. */
  final case class PcaModel(means: Array[Double],
                            components: Array[Array[Double]],
                            eigenvalues: Array[Double]) {
    def explainedVariance: Array[Double] = {
      val tr = eigenvalues.sum
      eigenvalues.map(_ / tr)
    }
  }

  /** Fit PCA: ONE distributed covariance pass + driver Jacobi. Means
    * come from the same aggregation's diagonal sums — a single action,
    * collecting d(d+1)/2 scalar rows (schema-sized, never data-sized). */
  def pca(vectors: DataFrame, vecCol: String, dims: Int): PcaModel = {
    val entries = covSums(vectors, vecCol, dims).collect()
    val m = Array.ofDim[Double](dims, dims)
    val means = Array.ofDim[Double](dims)
    entries.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1)
      val n = r.getLong(2).toDouble
      val sxy = r.getDouble(3); val sx = r.getDouble(4); val sy = r.getDouble(5)
      val c = (sxy - sx * sy / n) / n
      m(i)(j) = c; m(j)(i) = c
      if (i == j) means(i) = sx / n
    }
    val (vals, vecs) = jacobiEigen(m)
    PcaModel(means, vecs, vals)
  }

  /** Project onto the top-`k` components: out_c = dot(v - mean, pc_c).
    * Centering folded into the dot (dot(v,pc) - dot(mean,pc), the
    * second term a driver constant) so the row expression stays a
    * single codegen kernel per component. With `whiten`, each component
    * is scaled by 1/sqrt(eigenvalue) so the output has identity
    * covariance (the preconditioner k-means/PQ-style quantizers want).
    * Appends `outCol`. */
  def pcaProject(vectors: DataFrame, vecCol: String, outCol: String,
                 model: PcaModel, k: Int, whiten: Boolean = false): DataFrame = {
    require(k >= 1 && k <= model.components.length,
      s"pcaProject: k must be in [1, ${model.components.length}], got $k")
    val dims = model.means.length
    val v = slice(VectorOps.asDouble(col(vecCol)), 1, dims)
    val comps = (0 until k).map { c =>
      val pc = model.components(c)
      val meanDot = (0 until dims).map(i => model.means(i) * pc(i)).sum
      val raw = VecExpressions.dotProduct(v, typedlit(pc.toSeq)) - lit(meanDot)
      if (whiten) {
        // guard rank-deficient directions: a ~zero eigenvalue would blow
        // the scale up; emit 0 there instead (the direction carries no
        // variance to whiten)
        val ev = model.eigenvalues(c)
        if (ev > 1e-12) raw * lit(1.0 / math.sqrt(ev)) else lit(0.0)
      } else raw
    }
    vectors.withColumn(outCol, array(comps: _*))
  }

  // ------------------------------------------------- model persistence

  /** Persist a fitted model as a tiny parquet table (one row per
    * component: c, eigenvalue, component vector, plus the shared means
    * on every row — d rows of d+2 values, schema-sized). The served-PCA
    * shape: fit once on a corpus snapshot, project every later batch
    * with [[loadPca]] + [[pcaProject]] without refitting. */
  def savePca(spark: org.apache.spark.sql.SparkSession, model: PcaModel,
              dir: String): Unit = {
    import spark.implicits._
    model.components.indices.map { c =>
      (c, model.eigenvalues(c), model.components(c).toSeq, model.means.toSeq)
    }.toDF("c", "eigenvalue", "component", "means")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Load a model persisted by [[savePca]]. */
  def loadPca(spark: org.apache.spark.sql.SparkSession, dir: String): PcaModel = {
    val rows = spark.read.parquet(dir).orderBy("c").collect()
    require(rows.nonEmpty, s"loadPca: no model at $dir")
    PcaModel(
      means = rows.head.getSeq[Double](3).toArray,
      components = rows.map(_.getSeq[Double](2).toArray),
      eigenvalues = rows.map(_.getDouble(1)))
  }
}
