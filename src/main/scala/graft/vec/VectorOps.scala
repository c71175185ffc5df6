package graft.vec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]) —
  * SURVEY.md §7.5. Brute-force cosine top-k as the exact baseline, and an
  * IVF-style partitioned variant as the 100 TB scale path.
  *
  * All arithmetic is built-in higher-order functions (zip_with/aggregate)
  * so it stays inside codegen; vectors are cast to double once.
  */
object VectorOps {

  /** Cast a float vector column to double for stable arithmetic. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity — a native codegen kernel ([[VecExpressions]]):
    * the HOF form (`aggregate(zip_with(...))`) is CodegenFallback and
    * pays interpreted dispatch per pair; the kernel is bit-identical
    * (same fold order and association) and ~20x faster on pair-heavy
    * operators. */
  def cosine(a: Column, b: Column): Column =
    VecExpressions.cosineSim(a, b)

  /** Exact brute-force cosine top-k: every query row scored against every
    * candidate row, ranked per query.
    *
    * Scale shape: the query side is SMALL (a probe batch) and broadcast;
    * candidates stream through executors once — no shuffle of the big
    * side, one window per query partition for the top-k. For very large k
    * batches switch to the IVF variant below. */
  def bruteForceTopK(candidates: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    // small inputs arrive as one file = one partition; the scoring is
    // per-row CPU-bound, so spread the candidate side first
    val cand = candidates.select(col(idCol).as("cand_id"),
        asDouble(col(vecCol)).as("cand_vec"))
      .repartition(col("cand_id"))
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("q_vec"))
    val scored = cand.crossJoin(broadcast(q))
      .where(col("cand_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("cand_vec"), col("q_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("cand_id").as("neighbor_id"),
        // + 0.0 folds IEEE -0.0 (negative cos rounding to zero) to +0.0
        (round(col("cos"), 4) + lit(0.0)).as("cos"))
  }

  /** Random-hyperplane LSH bucketing for cosine similarity: `nBits`
    * deterministic pseudo-hyperplanes (component signs derived from
    * xxhash64 of (plane, dimension)) map each vector to a bit signature;
    * vectors sharing a signature bucket are near-duplicate candidates.
    * The embedding-space analogue of MinHash banding: one shuffle on the
    * bucket key, exact cosine verify inside buckets only. */
  def hyperplaneSignature(vec: Column, dim: Int, nBits: Int): Column = {
    // sign pattern of plane p = hash(p * dim + i) parity — deterministic,
    // no stored model
    val planes: Seq[Column] = (0 until nBits).map { p =>
      val signs: Column = aggregate(
        zip_with(vec, lit((0 until dim).map(i =>
            if (((p.toLong * dim + i) * 2654435761L >>> 16 & 1L) == 1L) 1.0 else -1.0).toArray),
          (x, s) => x * s),
        lit(0.0), (acc, x) => acc + x)
      when(signs >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    planes.reduce(_ + _)
  }

  /** Cosine near-duplicate pairs via hyperplane-LSH buckets + exact
    * verify (threshold on true cosine). */
  def lshCosinePairs(vectors: DataFrame, idCol: String, vecCol: String,
                     dim: Int, nBits: Int = 12,
                     threshold: Double = 0.3, maxBucket: Int = 200): DataFrame = {
    val sig = vectors
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .repartition(col("id"))
      .withColumn("bucket", hyperplaneSignature(col("v"), dim, nBits))
      .withColumn("bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("bucket"))))
      .where(col("bn") <= maxBucket)
      .select(col("id"), col("v"), col("bucket"))
    sig.as("a").join(sig.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("cos", cosine(col("a.v"), col("b.v")))
      .where(col("cos") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(col("cos"), 4).as("cos"))
  }

  /** Per-row centroid ranking as a PURE PROJECTION: the centroids are a
    * driver-held array (they are tiny by construction — nlist vectors),
    * inlined as literals, so ranking them per row needs no join, no
    * window, no shuffle — it runs inside whole-stage codegen over the
    * scan. Returns an array of centroid ids ordered best-first.
    * Ordering matches the previous window form: cosine desc, id asc. */
  private[vec] def centroidRanking(vec: Column,
                              cents: Seq[(Long, Array[Double])]): Column = {
    val ranked = array(cents.map { case (cid, cv) =>
      // codegen kernel; bit-identical to the old dot/(norm*litNorm) form
      val d = VecExpressions.cosineSim(vec, typedLit(cv.toSeq))
      // array_sort is ascending on the first field: negate the cosine;
      // ties fall through to centroid_id ascending — the old tie-break
      struct((-d).as("negd"), lit(cid).as("centroid_id"))
    }: _*)
    transform(array_sort(ranked), s => s.getField("centroid_id"))
  }

  /** Driver-side k-means refinement of the coarse centroids. Each
    * iteration is one aggregation with map-side combine: assignment is the
    * literal projection above (no shuffle), then posexplode(vector) ->
    * groupBy (centroid, dim) mean moves at most nlist*dim rows per task.
    * The collected model is nlist*dim doubles — trivially driver-sized. */
  def kmeansCentroids(vectors: DataFrame, vecCol: String,
                      init: Seq[(Long, Array[Double])],
                      iters: Int): Seq[(Long, Array[Double])] = {
    var cents = init
    for (_ <- 0 until iters) {
      val assigned = vectors
        .select(asDouble(col(vecCol)).as("v"))
        .withColumn("centroid_id",
          element_at(centroidRanking(col("v"), cents), 1))
      val means = assigned
        .select(col("centroid_id"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("centroid_id"), col("dim"))
        .agg(avg(col("x")).as("m"))
        .collect()
      val byId = means.groupBy(_.getLong(0))
      cents = cents.map { case (cid, old) =>
        byId.get(cid) match {
          case Some(rows) =>
            val m = old.clone()
            rows.foreach(r => m(r.getInt(1)) = r.getDouble(2))
            cid -> m
          case None => cid -> old // empty list keeps its seed
        }
      }
    }
    cents
  }

  /** Recall@k of an approximate top-k frame against the exact one (both
    * in the (query_id, rank, neighbor_id, cos) shape the searchers emit):
    * the fraction of exact (query, neighbor) pairs the approximate result
    * found. The measurement behind the default `kmeansIters` below — see
    * COVERAGE.md's recall table. */
  def recallAtK(approx: DataFrame, exact: DataFrame): Double = {
    val total = exact.count()
    if (total == 0) return 1.0
    val hits = exact.select(col("query_id"), col("neighbor_id"))
      .join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi")
      .count()
    hits.toDouble / total
  }

  // ------------------------------------------------------ product quantization

  /** Squared L2 distance (the PQ training/search metric) — a native
    * codegen kernel: the HOF form (aggregate(zip_with(...))) is
    * CodegenFallback, and this runs per candidate in every PQ re-rank
    * and per (point, centroid) in the coreset sampler. Bit-identical
    * (same index-ordered fold and association). */
  def l2sq(a: Column, b: Column): Column =
    VecExpressions.l2Sq(a, b)

  /** A trained product-quantization model: the vector space is split into
    * `m` subspaces of `subDim` dimensions; each subspace has its own
    * codebook of `ksub` centroids. A vector encodes to `m` small ints —
    * at dim=64/m=8/ksub=256 that is 8 bytes per vector instead of 256,
    * the 32x compression that lets a 100 TB embedding corpus fit a
    * memory-resident ANN tier. (Jegou, Douze, Schmid: "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011.) */
  final case class PqModel(m: Int, subDim: Int,
                           codebooks: Seq[Seq[Array[Double]]]) {
    def ksub: Int = codebooks.head.length
  }

  /** Train PQ codebooks: per-subspace k-means under squared L2, seeded
    * from the sub-vectors of the `ksub` smallest ids (deterministic — the
    * same discipline as the IVF seeds, and robust to sparse or offset id
    * spaces: seeds are picked by rank, not by assuming ids are dense from
    * 0). Each sweep is one [[PqEncodeExpr]] assignment PROJECTION (a
    * tight per-row loop, codebook passed as a codegen reference object —
    * zero exchanges, no N x m x ksub row blowup) + one mean aggregate
    * with map-side combine; the model (m * ksub * subDim doubles) is
    * collected driver-side, trivially small. `iters = 0` keeps the seeds
    * as-is — with ksub >= the number of distinct sub-vectors that makes
    * encoding LOSSLESS, the property the exhaustive oracle gate exploits. */
  def pqTrain(vectors: DataFrame, idCol: String, vecCol: String,
              m: Int = 8, ksub: Int = 256, iters: Int = 2): PqModel = {
    val dim = vectors.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val subDim = dim / m
    val base = vectors.select(col(idCol).cast("long").as("id"),
        asDouble(col(vecCol)).as("v"))
      .repartition(col("id"))
      .transform(graft.ops.Pins.pin) // seed TakeOrdered + every sweep share one scan
    // ksub-smallest ids via TakeOrdered (no full sort, no shuffle)
    val seedRows = base.orderBy(col("id")).limit(ksub).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    require(seedRows.nonEmpty,
      s"pqTrain: no seed vectors — is $idCol castable to long?")
    var model = PqModel(m, subDim,
      (0 until m).map(j => seedRows.toSeq.map { case (_, v) =>
        java.util.Arrays.copyOfRange(v, j * subDim, (j + 1) * subDim) }))
    for (_ <- 0 until iters) {
      val means = base
        .select(col("v"),
          posexplode(PqExpressions.encode(col("v"), model))
            .as(Seq("subspace", "code")))
        .select(col("subspace"), col("code"),
          posexplode(slice(col("v"),
              col("subspace") * lit(subDim) + lit(1), lit(subDim)))
            .as(Seq("dim", "x")))
        .groupBy(col("subspace"), col("code"), col("dim"))
        .agg(avg(col("x")).as("mean"))
        .collect()
      val byKey = means.groupBy(r => (r.getInt(0), r.getInt(1)))
      model = PqModel(m, subDim, model.codebooks.zipWithIndex.map { case (cb, j) =>
        cb.zipWithIndex.map { case (old, c) =>
          byKey.get((j, c)) match {
            case Some(rows) =>
              val nv = old.clone()
              rows.foreach(r => nv(r.getInt(2)) = r.getDouble(3))
              nv
            case None => old // empty cell keeps its seed
          }
        }
      })
    }
    model
  }

  /** Encode every vector to its m codebook codes: (id, codes array<int>).
    * A single [[PqEncodeExpr]] projection over one scan — no join, no
    * shuffle, no per-subspace row explosion; the corpus is touched
    * exactly once and the encode loop runs inside whole-stage codegen.
    * `keep` carries extra columns of `vectors` through the projection —
    * the index writers need (codes, list_id) together, and re-attaching
    * list_id with a join after a codes-only projection paid a whole
    * shuffle join per build/append for a column the frame already had. */
  def pqEncode(vectors: DataFrame, idCol: String, vecCol: String,
               model: PqModel, keep: Seq[String] = Nil): DataFrame =
    vectors.select(col(idCol).cast("long").as("id") +:
      PqExpressions.encode(asDouble(col(vecCol)), model).as("codes") +:
      keep.map(col): _*)

  /** PQ asymmetric-distance (ADC) top-k: each query precomputes, driver-
    * side, its m x ksub table of squared distances to every codebook
    * entry; a candidate's approximate distance is then m table lookups
    * over its 8-byte code — the float vectors are never touched at search
    * time. The tables ride a broadcast; the only wide operation is the
    * per-query top-k window over scored candidates. */
  def pqTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, model: PqModel): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val encoded = pqEncode(vectors, idCol, vecCol, model)
      .withColumnRenamed("id", "cand_id")
    val qRows = queries
      .select(col(idCol).cast("long").as("qid"), asDouble(col(vecCol)).as("qv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val tables = qRows.toSeq.map { case (qid, qv) =>
      val t = model.codebooks.zipWithIndex.map { case (cb, j) =>
        val qs = qv.slice(j * model.subDim, (j + 1) * model.subDim)
        cb.map(cv => cv.zip(qs).map { case (a, b) => (a - b) * (a - b) }.sum).toSeq
      }
      (qid, t)
    }.toDF("query_id", "tables")
    val scored = encoded.crossJoin(broadcast(tables))
      .where(col("cand_id") =!= col("query_id"))
      // adc_lookup kernel: the HOF lookup is CodegenFallback per
      // scanned candidate; bit-identical index-ordered fold
      .withColumn("dist",
        VecExpressions.adcLookup(col("codes"), col("tables")))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("dist"), col("cand_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("cand_id").as("neighbor_id"), round(col("dist"), 4).as("dist"))
  }

  /** PQ search with exact re-ranking — the standard recall fix (Jégou et
    * al., "Product Quantization for Nearest Neighbor Search", TPAMI'11
    * §V): ADC alone tops out low on high-dim data (measured 0.31
    * recall@5 at m=8/ksub=64 on the sf0.1 embeddings — 8 bits per
    * subvector is lossy), so ADC generates a `k * refine` shortlist
    * cheaply and exact squared-L2 re-ranks ONLY the shortlist.
    *
    * Scale: the shortlist (nQueries * k * refine rows) broadcasts back
    * against the vector scan, so the float vectors are touched for
    * shortlist members alone — the full corpus is still only ever read
    * through its 8-byte codes. Recall becomes "did the true neighbor
    * make a 4x-wider ADC shortlist", measured 2-3x higher than plain
    * ADC (graft.dev.PqRecall; table in COVERAGE.md). */
  def pqTopKRefined(vectors: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int, model: PqModel,
                    refine: Int = 4): DataFrame = {
    require(refine >= 1, s"pqTopKRefined: refine must be >= 1, got $refine")
    val shortlist = pqTopK(vectors, queries, idCol, vecCol, k * refine, model)
      .select(col("query_id"), col("neighbor_id"))
    val qv = queries.select(col(idCol).cast("long").as("query_id"),
      asDouble(col(vecCol)).as("q_vec"))
    vectors
      .select(col(idCol).cast("long").as("neighbor_id"),
        asDouble(col(vecCol)).as("cand_vec"))
      .join(broadcast(shortlist), Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("dist", l2sq(col("cand_vec"), col("q_vec")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("dist"), col("neighbor_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("dist"), 4).as("dist"))
  }

  /** IVF-PQ ("IVFADC", Jégou et al. TPAMI'11 §IV — the Faiss default at
    * billion scale): the coarse IVF quantizer partitions vectors into
    * `nlist` inverted lists, each vector's RESIDUAL (v - centroid) is
    * PQ-encoded to m bytes, and a query probes its `nprobe` nearest
    * lists with a per-(query, list) ADC table built from the query's
    * residual to that centroid. The residual trick is what makes PQ
    * codes sharp: residuals cluster near zero, so the same ksub entries
    * quantize a much smaller cell of space.
    *
    * Scale: assignment and residuals are literal projections over the
    * scan (no shuffle — nlist is small by design); the PQ model and the
    * nQ * nprobe ADC tables are driver-sized and broadcast; candidates
    * are scored only inside probed lists (N * nprobe / nlist of the
    * corpus) through their 8-byte codes. The only wide operation is the
    * per-query top-k window.
    *
    * Exactness identity the exhaustive gate exploits: ||q - v||^2 ==
    * ||(q - c) - (v - c)||^2 for v in list c, so with nprobe = nlist and
    * a lossless codebook (ksub >= distinct residual sub-vectors, 0
    * sweeps) ADC reproduces exact squared L2. */
  def ivfPqTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
                m: Int = 8, ksub: Int = 64, kmeansIters: Int = 2,
                pqIters: Int = 2): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val base = vectors.select(col(idCol).as("cand_id"),
        asDouble(col(vecCol)).as("cand_vec"))
      .repartition(col("cand_id"))
      .transform(graft.ops.Pins.pin) // seed + k-means sweeps + residual projection
    // nlist smallest ids by RANK (TakeOrdered — robust to sparse/offset
    // id spaces, the same discipline as the PQ seeds)
    val seed = base.orderBy(col("cand_id")).limit(nlist)
      .select(col("cand_id"), col("cand_vec")).collect()
      .map(r => r.getAs[Number](0).longValue -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).toSeq
    val cents = kmeansCentroids(base, "cand_vec", seed, kmeansIters)
    def centVec(cid: Column): Column =
      cents.foldLeft(lit(null).cast("array<double>")) { case (acc, (id, cv)) =>
        when(cid === id, typedLit(cv.toSeq)).otherwise(acc)
      }
    // assignment + residual: pure projections; checkpointed because the
    // frame feeds the PQ training sweeps, the encode, AND the list join
    val resid = base
      .withColumn("centroid_id",
        element_at(centroidRanking(col("cand_vec"), cents), 1))
      .withColumn("residual",
        zip_with(col("cand_vec"), centVec(col("centroid_id")), (x, c) => x - c))
      .transform(graft.ops.Pins.pin)
    val model = pqTrain(resid, "cand_id", "residual", m, ksub, pqIters)
    val encoded = pqEncode(resid, "cand_id", "residual", model)
      .withColumnRenamed("id", "cand_id")
      .join(resid.select(col("cand_id"), col("centroid_id")), "cand_id")
    // driver-side: nprobe nearest lists per query (cosine ranking, the
    // ivfTopK discipline), one ADC table per (query, probed list) from
    // the query's residual to that centroid
    val qRows = queries.select(col(idCol).cast("long").as("qid"),
        asDouble(col(vecCol)).as("qv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def cosD(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      d / (na * nb)
    }
    val probeTables = qRows.toSeq.flatMap { case (qid, qv) =>
      cents.map { case (cid, cv) => (cosD(qv, cv), cid, cv) }
        .sortBy { case (c, cid, _) => (-c, cid) }
        .take(nprobe)
        .map { case (_, cid, cv) =>
          val qRes = qv.zip(cv).map { case (x, c) => x - c }
          val tab = model.codebooks.zipWithIndex.map { case (cb, j) =>
            val qs = qRes.slice(j * model.subDim, (j + 1) * model.subDim)
            cb.map(e => e.zip(qs).map { case (a, b) => (a - b) * (a - b) }.sum).toSeq
          }
          (qid, cid, tab)
        }
    }.toDF("query_id", "centroid_id", "tables")
    val scored = encoded.join(broadcast(probeTables), Seq("centroid_id"))
      .where(col("cand_id") =!= col("query_id"))
      // adc_lookup kernel: the HOF lookup is CodegenFallback per
      // scanned candidate; bit-identical index-ordered fold
      .withColumn("dist",
        VecExpressions.adcLookup(col("codes"), col("tables")))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("dist"), col("cand_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("cand_id").as("neighbor_id"), round(col("dist"), 4).as("dist"))
  }

  /** IVF-style approximate search: vectors are assigned to their nearest
    * coarse centroid (the inverted lists); a query probes only the
    * `nprobe` nearest lists.
    *
    * Centroids seed from a deterministic subset of the data, optionally
    * refined with `kmeansIters` k-means sweeps. The default of 2 sweeps
    * comes from measured recall@5 vs [[bruteForceTopK]] on the sf0.1
    * embeddings (graft.dev.IvfRecall; table in COVERAGE.md): 0 iters
    * 0.74, 2 iters 0.78, 5 iters 0.81 at +35% build time — two sweeps
    * take most of the lift at ~10% extra cost. Assignment and probing are
    * literal projections (no join, no window, no shuffle — the centroid
    * model is driver-held and inlined); the probe join against the small
    * broadcast query side is the ONLY exchange, so the candidate scan
    * drops from N to N*nprobe/nlist and nothing is shuffled N*nlist-wide. */
  def ivfTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
              kmeansIters: Int = 2): DataFrame = {
    val base = vectors.select(col(idCol).as("cand_id"),
      asDouble(col(vecCol)).as("cand_vec")).repartition(col("cand_id"))
      // consumed by the seed TakeOrdered, every k-means sweep, AND the
      // final assignment — each a separate job that would otherwise
      // re-scan and re-shuffle the full vector table
      .transform(graft.ops.Pins.pin)
    // seed from the nlist SMALLEST ids by rank (TakeOrdered — robust to
    // sparse/offset id spaces; for dense ids this is the same set as the
    // old id < nlist filter, so the measured numbers stand): first-ids
    // measured BETTER on the sf0.1 embeddings than hash-spread sampling
    // (0.78 vs 0.53 recall@5 at 2 refinement sweeps) — k-means
    // refinement then owns seed quality; graft.dev.IvfRecall re-measures
    // if the seeding strategy changes
    val seed = base.orderBy(col("cand_id")).limit(nlist)
      .select(col("cand_id"), col("cand_vec"))
      .collect()
      .map(r => r.getAs[Number](0).longValue -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).toSeq
    val cents = kmeansCentroids(base, "cand_vec", seed, kmeansIters)
    // nearest list per vector: one projection over the scan
    val assigned = base.withColumn("centroid_id",
      element_at(centroidRanking(col("cand_vec"), cents), 1))
    // nprobe nearest lists per query: same projection + slice + explode
    val probes = queries
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("q_vec"))
      .withColumn("centroid_id",
        explode(slice(centroidRanking(col("q_vec"), cents), 1, nprobe)))
    // score only within probed lists
    val scored = assigned.join(broadcast(probes), Seq("centroid_id"))
      .where(col("cand_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("cand_vec"), col("q_vec")))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("cand_id").as("neighbor_id"),
        (round(col("cos"), 4) + lit(0.0)).as("cos"))
  }

  /** Semantic benchmark decontamination — the EMBEDDING-space member of
    * the decontamination family (exact fingerprint / near-dup MinHash /
    * n-gram overlap / Bloom cover the lexical space): a corpus document
    * is contaminated when its embedding sits within cosine >= `threshold`
    * of ANY benchmark embedding — catching paraphrased eval material
    * that shares no n-gram with the benchmark. Returns the distinct
    * contaminated ids; compose with a left_anti to remove.
    *
    * Scale: the benchmark is small by assumption and BROADCASTS with
    * precomputed norms; the corpus streams through one scan (no
    * shuffle) and only the contaminated-id set — bounded by the corpus'
    * true contamination — is exchanged for the distinct. */
  def semanticContaminatedIds(corpus: DataFrame, benchmark: DataFrame,
                              idCol: String, vecCol: String,
                              threshold: Double): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .repartition(col("id"))
    val b = broadcast(benchmark.select(asDouble(col(vecCol)).as("bv")))
    // non-equi LEFT SEMI against the broadcast: each corpus row is
    // checked against the in-memory benchmark and emitted at most once —
    // no pair blowup, no shuffle of the corpus
    c.join(b, cosine(col("v"), col("bv")) >= threshold, "left_semi")
      .select(col("id"))
  }

  /** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication", arXiv 2303.09540):
    * semantic near-duplicate pruning on embeddings. K-means partitions
    * the corpus into `nlist` clusters; pairs are scored by cosine WITHIN
    * each cluster only, and a document is marked a duplicate when a
    * smaller-id document of the same cluster sits at cosine >=
    * `threshold`. The paper drops all but the member farthest from the
    * centroid per epsilon-group; any one-survivor rule is admissible, and
    * keep-smallest-id is the engine-reproducible one (same convention as
    * the exact/MinHash dedup family). Output: (id, cluster, keep).
    *
    * Scale: the clustering BOUNDS the quadratic term — candidate pairs
    * form per cluster (mean size N/nlist), never across the corpus, which
    * is the paper's own trick for running on 5B documents (they use 50k
    * clusters). Assignment is the same literal-projection as [[ivfTopK]]
    * (centroid model driver-held and inlined — one scan, no shuffle), so
    * the only wide operations are the cluster-key self-join and the
    * duplicate-id collapse. Raise `nlist` with corpus size so clusters
    * stay partition-sized; `kmeansIters = 0` keeps the deterministic
    * rank-based seeds (the oracle-gate configuration). */
  def semDedup(vectors: DataFrame, idCol: String, vecCol: String,
               nlist: Int = 16, threshold: Double = 0.9,
               kmeansIters: Int = 2): DataFrame = {
    val base = vectors.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .repartition(col("id"))
      // seed TakeOrdered, each k-means sweep, and the assignment all
      // re-consume the scan — same discipline as ivfTopK
      .transform(graft.ops.Pins.pin)
    // getAs[Number]: int ids work as-is (the pqTrain lesson — never
    // assume the id column is a long)
    val seed = base.orderBy(col("id")).limit(nlist)
      .collect()
      .map(r => r.getAs[Number](0).longValue -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).toSeq
    val cents = kmeansCentroids(base, "v", seed, kmeansIters)
    val assigned = base.withColumn("cluster",
      element_at(centroidRanking(col("v"), cents), 1))
    val dupIds = assigned.select(col("cluster"), col("id").as("id_a"), col("v").as("v_a"))
      .join(assigned.select(col("cluster"), col("id").as("id_b"), col("v").as("v_b")),
        Seq("cluster"))
      .where(col("id_a") < col("id_b"))
      .where(cosine(col("v_a"), col("v_b")) >= threshold)
      .select(col("id_b").as("id")).distinct()
    assigned.select(col("id"), col("cluster"))
      .join(dupIds.withColumn("__dup", lit(true)), Seq("id"), "left")
      .select(col("id"), col("cluster"), col("__dup").isNull.as("keep"))
  }

  /** Best (cluster id, cosine) per row against the driver-held centroid
    * literals — the struct form of [[centroidRanking]], for operators
    * that need the winning similarity, not just the winning id. Same
    * cost shape: pure projection, no join/window/shuffle. */
  private def centroidBest(vec: Column,
                           cents: Seq[(Long, Array[Double])]): Column = {
    val ranked = array(cents.map { case (cid, cv) =>
      val d = VecExpressions.cosineSim(vec, typedLit(cv.toSeq))
      struct((-d).as("negcos"), lit(cid).as("centroid_id"))
    }: _*)
    element_at(array_sort(ranked), 1)
  }

  private def assignedWithCos(vectors: DataFrame, idCol: String,
                              vecCol: String, nlist: Int,
                              kmeansIters: Int): DataFrame = {
    val base = vectors.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .repartition(col("id"))
      .transform(graft.ops.Pins.pin) // seed TakeOrdered + sweeps + assignment share one scan
    val seed = base.orderBy(col("id")).limit(nlist)
      .collect()
      .map(r => r.getAs[Number](0).longValue -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).toSeq
    val cents = kmeansCentroids(base, "v", seed, kmeansIters)
    val best = centroidBest(col("v"), cents)
    base.select(col("id"),
      best.getField("centroid_id").as("cluster"),
      (-best.getField("negcos")).as("proto_cos"))
  }

  /** Prototypicality pruning (the D4 recipe, SemDeDup's sibling): within
    * each embedding cluster, DROP the `dropFraction` most prototypical
    * documents — the ones closest to their cluster centroid, i.e. the
    * templated/boilerplate mass that survives lexical dedup — and keep
    * the diverse remainder. Output is the audit frame
    * (id, cluster, proto_cos, keep), so callers can inspect the cut
    * instead of just losing rows.
    *
    * `kmeansIters = 0` pins centroids to the deterministic seed vectors,
    * which makes the whole operator SQL-expressible — the oracle-gated
    * validation mode; refined centroids (the default) are the production
    * mode, spec-gated. Scale shape: assignment is a literal projection
    * over one scan; the only wide operation is one window partitioned by
    * cluster (count + rank share the single exchange). Clusters hold
    * ~N/nlist rows — grow `nlist` with the corpus to keep them
    * partition-sized, the same dial as [[semDedup]]. */
  def protoPrune(vectors: DataFrame, idCol: String, vecCol: String,
                 nlist: Int = 16, dropFraction: Double = 0.1,
                 kmeansIters: Int = 2): DataFrame = {
    require(dropFraction >= 0.0 && dropFraction < 1.0,
      s"protoPrune: dropFraction must be in [0, 1), got $dropFraction")
    val assigned = assignedWithCos(vectors, idCol, vecCol, nlist, kmeansIters)
    val wc = Window.partitionBy(col("cluster"))
    val wr = Window.partitionBy(col("cluster"))
      .orderBy(col("proto_cos").desc, col("id"))
    assigned
      .withColumn("__n", count(lit(1)).over(wc))
      .withColumn("__rnk", row_number().over(wr))
      .withColumn("keep",
        col("__rnk") > ceil(col("__n") * lit(dropFraction)))
      .select(col("id"), col("cluster"),
        (round(col("proto_cos"), 4) + lit(0.0)).as("proto_cos"), col("keep"))
  }

  /** Cluster-balanced subsample: cap each embedding cluster at `cap`
    * members, selected by the md5 bottom-k rule — the semantic-space
    * form of [[graft.functions.Sampling.stratifiedSample]] (same
    * determinism and nesting guarantees: reproducible across runs,
    * partitionings and engines; growing `cap` extends the sample).
    * The diversity-flattening draw a training-mix builder uses when the
    * corpus over-represents a few semantic modes.
    *
    * Same validation/production split as [[protoPrune]]:
    * `kmeansIters = 0` is the oracle-gated deterministic mode. One
    * literal-projection assignment + one window on the cluster key. */
  def clusterCapSample(vectors: DataFrame, idCol: String, vecCol: String,
                       cap: Int, nlist: Int = 16,
                       kmeansIters: Int = 2): DataFrame = {
    require(cap >= 1, s"clusterCapSample: cap must be >= 1, got $cap")
    val assigned = assignedWithCos(vectors, idCol, vecCol, nlist, kmeansIters)
    val w = Window.partitionBy(col("cluster"))
      .orderBy(md5(col("id").cast("string")), col("id"))
    assigned
      .withColumn("__rn", row_number().over(w))
      .withColumn("keep", col("__rn") <= cap)
      .select(col("id"), col("cluster"), col("keep"))
  }

  /** Approximate kNN graph (all-pairs top-k self-join): each vector's
    * `k` nearest neighbors, found within shared coarse clusters —
    * the backbone frame for graph-based semantic dedup and diversity
    * audits, where BOTH sides are the full corpus so the broadcast
    * discipline of [[ivfTopK]] cannot apply. Output:
    * (src_id, rank, dst_id, cos).
    *
    * BOTH endpoints are multi-assigned to their `nassign` nearest
    * clusters (a pair is a candidate iff the two top-`nassign` sets
    * intersect — symmetric multi-assignment recovers boundary neighbors
    * that one-sided IVF probing misses). A pair sharing several clusters
    * would join once per shared cluster; the `cluster ==
    * array_min(array_intersect(...))` predicate keeps exactly one copy,
    * as a PROJECTION on the join output — no distinct, no second
    * shuffle. The single wide operation is the cluster-key join +
    * per-source window. `nlist = 1` degenerates to the exact
    * brute-force graph — the oracle-gated mode (quadratic;
    * validation-scale only). Production: grow `nlist` so lists stay
    * partition-sized; cost is ~(N * nassign / nlist)^2 * nlist
    * comparisons. Recall vs the exact graph is spec-measured
    * (VectorOpsSpec); `nassign` is the recall/cost dial. */
  def knnGraph(vectors: DataFrame, idCol: String, vecCol: String,
               k: Int, nlist: Int = 16, nassign: Int = 2,
               kmeansIters: Int = 2): DataFrame = {
    require(nassign >= 1 && nassign <= nlist,
      s"knnGraph: nassign must be in [1, nlist], got $nassign")
    val base = vectors.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .repartition(col("id"))
      .transform(graft.ops.Pins.pin) // seed + sweeps + both join sides share one scan
    val seed = base.orderBy(col("id")).limit(nlist)
      .collect()
      .map(r => r.getAs[Number](0).longValue -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).toSeq
    val cents = kmeansCentroids(base, "v", seed, kmeansIters)
    val assigned = base.select(col("id"), col("v"),
      slice(centroidRanking(col("v"), cents), 1, nassign).as("clusters"))
    def side(p: String): DataFrame = assigned.select(
      col("id").as(s"${p}_id"), col("v").as(s"${p}_v"),
      col("clusters").as(s"${p}_clusters"),
      explode(col("clusters")).as("cluster"))
    val scored = side("src").join(side("dst"), Seq("cluster"))
      .where(col("src_id") =!= col("dst_id"))
      .where(col("cluster") ===
        array_min(array_intersect(col("src_clusters"), col("dst_clusters"))))
      .withColumn("cos", cosine(col("src_v"), col("dst_v")))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("src_id")).orderBy(col("cos").desc, col("dst_id"))))
      .where(col("rank") <= k)
      .select(col("src_id"), col("rank").cast("long").as("rank"),
        col("dst_id"), (round(col("cos"), 4) + lit(0.0)).as("cos"))
  }

  // ------------------------------------------------------ drift monitor

  /** Embedding-space drift between two corpus snapshots — the vector
    * counterpart of [[graft.text.SnapshotOps.tokenDrift]]: when the
    * embedder, the upstream corpus, or a preprocessing stage moves, the
    * MEAN vector moves with it, and a retrieval/dedup stack calibrated
    * on the old geometry silently degrades. One row out:
    *
    *  - `centroid_cos`: cosine between the two snapshots' mean vectors
    *    (1.0 = same direction; the headline drift number),
    *  - `mean_abs_diff`: mean per-dimension |mu_a - mu_b| (localizes a
    *    shift the cosine averages away),
    *  - `n_a` / `n_b` / `dims`.
    *
    * Shape: posexplode to (dim, value), one hash aggregate keyed on the
    * DIMENSION (64-1024 groups — schema-sized, never corpus-sized), a
    * dims-sized join, one final reduce. Each corpus is scanned once. */
  def embeddingDrift(a: DataFrame, b: DataFrame,
                     vecCol: String = "embedding"): DataFrame = {
    def mean(d: DataFrame, side: String) = d
      .select(posexplode(asDouble(col(vecCol))).as(Seq("dim", "v")))
      .groupBy(col("dim"))
      .agg(avg(col("v")).as(s"mu_$side"), count(lit(1)).as(s"n_$side"))
    mean(a, "a").join(mean(b, "b"), Seq("dim"))
      .agg(
        max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        count(lit(1)).as("dims"),
        (round(sum(col("mu_a") * col("mu_b")) /
          (sqrt(sum(col("mu_a") * col("mu_a"))) *
            sqrt(sum(col("mu_b") * col("mu_b")))), 4) + lit(0.0))
          .as("centroid_cos"),
        round(avg(abs(col("mu_a") - col("mu_b"))), 4).as("mean_abs_diff"))
  }

  // ------------------------------------------- hard-negative mining

  /** Supervised hard-negative mining for contrastive/embedding training
    * (the DPR/ANCE recipe): for every query vector, the `k` MOST
    * SIMILAR candidates with a DIFFERENT label — the negatives that sit
    * closest to the decision boundary, which is what makes them worth
    * training on (random negatives are trivially separable). Output:
    * (query_id, rank, neighbor_id, neighbor_label, cos).
    *
    * Exact form: same shape as [[bruteForceTopK]] — candidates spread,
    * queries broadcast, codegen cosine, per-query window — with the
    * label disagreement folded into the pair predicate (filtered BEFORE
    * scoring, so same-label pairs never pay the kernel). At corpus
    * scale the candidate generation swaps to [[ivfTopK]]-style probing
    * with an oversampled shortlist filtered by label, exactly like the
    * ANN family's approx modes. */
  def hardNegatives(candidates: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, labelCol: String,
                    k: Int): DataFrame = {
    val cand = candidates.select(col(idCol).as("cand_id"),
        asDouble(col(vecCol)).as("cand_vec"),
        col(labelCol).as("neighbor_label"))
      .repartition(col("cand_id"))
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("q_vec"), col(labelCol).as("q_label"))
    val scored = cand.crossJoin(broadcast(q))
      .where(col("cand_id") =!= col("query_id") &&
        col("neighbor_label") =!= col("q_label"))
      .withColumn("cos", cosine(col("cand_vec"), col("q_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("cand_id").as("neighbor_id"), col("neighbor_label"),
        (round(col("cos"), 4) + lit(0.0)).as("cos"))
  }
}
