package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The multilingual corpus-construction composition — the cross-lingual
  * twin of [[CorpusPipeline]]: align the source embedding space onto
  * the target space (Procrustes over seed pairs), margin-mine bitext in
  * the aligned space (Artetxe-Schwenk intersection strategy),
  * decontaminate the mined pairs against an eval benchmark (drop a pair
  * when EITHER side shares a word n-gram with it), and pack the
  * surviving pairs into fixed-length training sequences.
  *
  * Scale shape: each stage keeps its own documented scale path — the
  * alignment is one d²-keyed cross-covariance aggregation + a driver
  * d x d SVD; mining touches only candidate pairs (feed
  * [[graft.vec.Bitext.marginScoresOver]] from the ANN tier at corpus
  * scale; [[graft.vec.Bitext.minePairs]] here is the exhaustive
  * validation mode); decontamination broadcasts the benchmark gram set;
  * packing is the two-phase distributed prefix sum. The mined-pair
  * frame is checkpointed: it is at most one pair per source doc and
  * feeds BOTH the packer and the final target re-join — without
  * truncation each consumer re-runs the whole mine + decontaminate
  * subtree.
  *
  * Oracle-gated end to end as `q_x_multiling_pipeline` (planted
  * rotation; cosine rotation-invariance makes the mining
  * SQL-replayable, and the output is id/count-typed so the ~1e-12 SVD
  * recovery error cannot perturb the hash).
  */
object MultilingPipeline {

  /** Run the composition. `seedPairs` carries (srcVecCol, tgtVecCol)
    * rows — known-parallel anchors the alignment is learned from.
    * Returns one row per surviving mined pair: (src_id, tgt_id,
    * n_tokens, start_offset, seq_first, seq_last). */
  def run(srcVecs: DataFrame, tgtVecs: DataFrame, seedPairs: DataFrame,
          docs: DataFrame, benchmark: DataFrame,
          idCol: String = "vec_id", vecCol: String = "embedding",
          docIdCol: String = "doc_id", textCol: String = "text",
          dims: Int = 64, k: Int = 4, minMargin: Double = 1.0,
          ngramN: Int = 5, ctxLen: Int = 512,
          seedSrcCol: String = "__x", seedTgtCol: String = "__y"): DataFrame = {
    val w = graft.vec.Align.procrustes(seedPairs, seedSrcCol, seedTgtCol, dims)
    val alignedSrc = graft.vec.Align.applyMap(srcVecs, vecCol, "__a", w)
      .select(col(idCol), col("__a").as(vecCol))
    val mined = graft.vec.Bitext.minePairs(alignedSrc, tgtVecs, idCol,
        vecCol, k, minMargin)
      .select(col("src_id"), col("tgt_id"))
    // checkpointed: the (tiny) contaminated-id list feeds BOTH anti-
    // joins — without truncation the gram-explode over all docs runs
    // twice (the same two-consumer shape as `sized` below)
    val contaminated = TextOps.ngramOverlapIds(
      docs, benchmark, docIdCol, textCol, textCol, ngramN)
      .transform(graft.ops.Pins.pin)
    val clean = mined
      .join(contaminated.select(col(docIdCol).as("src_id")),
        Seq("src_id"), "left_anti")
      .join(contaminated.select(col(docIdCol).as("tgt_id")),
        Seq("tgt_id"), "left_anti")
    val toks = docs.select(col(docIdCol),
      size(TextOps.tokens(col(textCol))).cast("long").as("__nt"))
    val sized = clean
      .join(toks.select(col(docIdCol).as("src_id"),
        col("__nt").as("__ns")), "src_id")
      .join(toks.select(col(docIdCol).as("tgt_id"),
        col("__nt").as("__ntg")), "tgt_id")
      .select(col("src_id"), col("tgt_id"),
        (col("__ns") + col("__ntg")).as("pair_tokens"))
      .transform(graft.ops.Pins.pin)
    Packing.packSequences(sized, "src_id", "pair_tokens", ctxLen)
      .join(sized.select(col("src_id"), col("tgt_id")), "src_id")
      .select(col("src_id"), col("tgt_id"),
        col("n_tokens"), col("start_offset"),
        col("seq_first").cast("long").as("seq_first"),
        col("seq_last").cast("long").as("seq_last"))
  }
}
