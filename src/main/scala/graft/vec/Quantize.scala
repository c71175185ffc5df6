package graft.vec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) and truncation audits for embedding
  * columns — the memory-tier levers between full-precision vectors
  * (4 bytes/dim as float) and product quantization (sub-byte/dim):
  *
  *   - SQ8 stores one byte per dimension (4x smaller than float32)
  *     with a per-dimension affine scale, the faiss
  *     `ScalarQuantizer(QT_8bit)` recipe. Unlike PQ the codes
  *     dequantize independently per dimension, so search stays a
  *     plain dot/cosine kernel over dequantized values (asymmetric
  *     distance: full-precision query against dequantized
  *     candidates).
  *   - Matryoshka-style truncation (Kusupati et al. 2022) keeps only
  *     the first d dimensions. [[truncationOverlap]] measures what
  *     that costs on THIS corpus: top-k agreement between full-dim
  *     and truncated-dim retrieval, per query.
  *
  * Everything here is deterministic (no sampling, no iterative
  * training), so both operators are exactly reproducible in SQL and
  * hash-gated against the DuckDB oracle — a rarity for ANN-adjacent
  * code, where usually only exhaustive twins gate the machinery.
  *
  * Scale shape: training is ONE aggregation with a schema-bounded key
  * space (the dimension index — dims rows out, never data-sized);
  * the model is dims*2 doubles collected driver-side (trivial, same
  * discipline as [[VectorOps.pqTrain]]); encode/dequantize are
  * row-local projections with the model as literal arrays (no join,
  * no shuffle, broadcast-free).
  */
object Quantize {

  /** Per-dimension affine quantization range: code c in 0..255 maps to
    * `mins(i) + c * (maxs(i) - mins(i)) / 255`. */
  final case class Sq8Model(mins: Array[Double], maxs: Array[Double]) {
    def dims: Int = mins.length
  }

  /** Learn per-dimension [min, max] in ONE pass: explode to
    * (dim, value) pairs — key space = dims, schema-bounded like
    * [[Reduce.covMatrix]]'s pair explode — and min/max-aggregate with
    * map-side combine. */
  def sq8Train(vectors: DataFrame, vecCol: String, dims: Int): Sq8Model = {
    require(dims >= 1, s"sq8Train: dims must be >= 1, got $dims")
    val rows = vectors
      .select(posexplode(VectorOps.asDouble(col(vecCol))).as(Seq("dim", "x")))
      .where(col("dim") < dims)
      .groupBy(col("dim"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .collect()
    require(rows.length == dims,
      s"sq8Train: expected $dims dims, got ${rows.length} — " +
        "vectors shorter than dims?")
    val mins = new Array[Double](dims)
    val maxs = new Array[Double](dims)
    rows.foreach { r =>
      val d = r.getInt(0); mins(d) = r.getDouble(1); maxs(d) = r.getDouble(2)
    }
    Sq8Model(mins, maxs)
  }

  private def mnAt(model: Sq8Model, i: Column): Column =
    element_at(typedlit(model.mins.toSeq), i + lit(1))
  private def mxAt(model: Sq8Model, i: Column): Column =
    element_at(typedlit(model.maxs.toSeq), i + lit(1))

  /** Quantize a double-array column to int codes 0..255. Degenerate
    * dimensions (max == min) encode to 0. Values outside the trained
    * range (new vectors after training) clamp to the range ends. */
  def sq8Encode(vec: Column, model: Sq8Model): Column =
    transform(vec, (x, i) => {
      val mn = mnAt(model, i); val mx = mxAt(model, i)
      val q = round((x.cast("double") - mn) / (mx - mn) * lit(255.0))
      when(mx === mn, lit(0))
        .otherwise(greatest(lit(0.0), least(lit(255.0), q))).cast("int")
    })

  /** Dequantize int codes back to doubles under the model's scales. */
  def sq8Dequant(codes: Column, model: Sq8Model): Column =
    transform(codes, (c, i) => {
      val mn = mnAt(model, i); val mx = mxAt(model, i)
      mn + c.cast("double") * (mx - mn) / lit(255.0)
    })

  /** The quantize->dequantize round trip as one projection (what the
    * recon audit and asymmetric search actually consume; fusing skips
    * materializing the codes). Mirrors the oracle's algebra exactly:
    * `mn + round((x-mn)/(mx-mn)*255) * (mx-mn)/255`. */
  def sq8Roundtrip(vec: Column, model: Sq8Model): Column =
    transform(vec, (x0, i) => {
      val x = x0.cast("double")
      val mn = mnAt(model, i); val mx = mxAt(model, i)
      when(mx === mn, mn).otherwise(
        mn + round((x - mn) / (mx - mn) * lit(255.0)) * (mx - mn) / lit(255.0))
    })

  /** Per-vector L2 reconstruction error of the SQ8 round trip — the
    * audit run before committing a corpus to the quantized tier
    * (row-local projection; index-ordered fold like the cosine
    * kernel). */
  def sq8ReconError(vectors: DataFrame, idCol: String, vecCol: String,
                    model: Sq8Model): DataFrame = {
    val v = VectorOps.asDouble(col(vecCol))
    val dq = sq8Roundtrip(col(vecCol), model)
    vectors.select(col(idCol),
      // l2sq kernel: bit-identical index-ordered fold, codegen'd
      sqrt(VecExpressions.l2Sq(v, dq)).as("l2_err"))
  }

  /** Asymmetric SQ8 top-k: full-precision queries scored against
    * DEQUANTIZED candidates (the faiss ADC discipline — the store
    * holds 1-byte codes; only the tiny query side stays float). Same
    * scale shape as [[VectorOps.bruteForceTopK]]: broadcast queries,
    * candidates stream once, per-query window for the top-k. */
  def sq8TopK(candidates: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              model: Sq8Model): DataFrame = {
    val cand = candidates.select(col(idCol).as("cand_id"),
        sq8Roundtrip(col(vecCol), model).as("cand_vec"))
      .repartition(col("cand_id"))
    val q = queries.select(col(idCol).as("query_id"),
      VectorOps.asDouble(col(vecCol)).as("q_vec"))
    val scored = cand.crossJoin(broadcast(q))
      .where(col("cand_id") =!= col("query_id"))
      .withColumn("cos", VectorOps.cosine(col("cand_vec"), col("q_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("cand_id").as("neighbor_id"),
        // + 0.0 folds IEEE -0.0 (negative cos rounding to zero) to +0.0
        (round(col("cos"), 4) + lit(0.0)).as("cos"))
  }

  /** Matryoshka truncation audit: per query, the fraction of the
    * full-dimension cosine top-k that survives when retrieval uses
    * only the first `keepDims` dimensions. High overlap = the corpus
    * tolerates truncated (cheaper) retrieval at that budget. Two
    * broadcast-query scans + a semi-join-sized agg — nothing
    * data-squared beyond the scored pairs both rankings need. */
  def truncationOverlap(candidates: DataFrame, queries: DataFrame,
                        idCol: String, vecCol: String, k: Int,
                        keepDims: Int): DataFrame = {
    val full = VectorOps.bruteForceTopK(candidates, queries, idCol, vecCol, k)
    def trunc(df: DataFrame): DataFrame =
      df.withColumn(vecCol, slice(col(vecCol), 1, keepDims))
    val short = VectorOps.bruteForceTopK(trunc(candidates), trunc(queries),
      idCol, vecCol, k)
    val hits = full.select(col("query_id"), col("neighbor_id"))
      .join(short.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
    // left join back so a query with ZERO surviving neighbors still rows
    full.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), lit(keepDims).cast("long").as("kept_dims"),
        round(coalesce(col("hits"), lit(0L)).cast("double") / lit(k), 4)
          .as("overlap"))
  }
}
