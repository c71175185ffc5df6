package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing: lay the corpus out as one long
  * token stream in deterministic id order, then cut it into fixed-length
  * context windows — the layout step a pre-training data loader needs
  * (every GPT-style pipeline packs documents this way; EOD tokens and
  * attention resets are the consumer's concern, the engine's job is the
  * deterministic offset arithmetic).
  *
  * The core is a GLOBAL prefix sum over ids —
  * [[graft.ops.Scans.exclusivePrefixSum]], the two-phase distributed
  * scan: one range shuffle, one tiny driver collect, no
  * single-partition stage anywhere.
  */
object Packing {

  /** Assign each doc its half-open span [start_offset, start_offset+n)
    * in the concatenated token stream and the context windows it lands
    * in (`seq_first`..`seq_last`, window length `ctxLen`). Zero-token
    * docs are dropped — they occupy no space in the stream.
    *
    * Output: (id, n_tokens, start_offset, seq_first, seq_last).
    * Deterministic in the id order regardless of input layout. */
  def packSequences(docs: DataFrame, idCol: String, nTokensCol: String,
                    ctxLen: Int): DataFrame = {
    require(ctxLen >= 1, s"packSequences: ctxLen must be >= 1, got $ctxLen")
    val base = docs
      .select(col(idCol).as("id"), col(nTokensCol).cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0)
    graft.ops.Scans.exclusivePrefixSum(base, "id", "n_tokens", "start_offset")
      .withColumn("seq_first", floor(col("start_offset") / ctxLen))
      .withColumn("seq_last",
        floor((col("start_offset") + col("n_tokens") - 1) / ctxLen))
      .select(col("id").as(idCol), col("n_tokens"), col("start_offset"),
        col("seq_first"), col("seq_last"))
  }
}
