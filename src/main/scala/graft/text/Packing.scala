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

  /** Document-boundary-respecting bin packing (next-fit): walk docs in
    * id order, keep adding to the current bin while it fits, open a new
    * bin otherwise — the packing style loaders use when documents must
    * NOT split across training sequences (T5-style). A doc larger than
    * `capacity` gets a bin to itself (callers own the truncate/chunk
    * policy for those).
    *
    * Parallel next-fit is made deterministic by cutting the id order
    * into fixed `chunkDocs`-row chunks first (global rank via the
    * two-phase scan) and packing each chunk independently: the result
    * is a pure function of (id order, chunkDocs, capacity) — cluster
    * layout, partition count, and scheduling cannot change it, the
    * reproducibility discipline of every selector in this engine. The
    * cost is at most one under-filled bin per chunk boundary (waste
    * <= capacity/chunkDocs per doc — vanishing at scale); the win is
    * that chunks pack in parallel across the cluster, where true
    * sequential next-fit is a one-task scan of 100 TB.
    *
    * Output: (id, n_units, bin_id, offset_in_bin), bin_id = the id of
    * the bin's first document (globally unique, stable). `sizeCol` is
    * whatever unit the capacity is in — tokens, chars, bytes.
    *
    * The per-chunk fold is the one `mapPartitions` in the text stack: a
    * stateful scan with reset is the textbook case composition can't
    * express (a running sum that conditionally resets is not a prefix
    * sum), and the state is three longs. */
  def packBinsNextFit(docs: DataFrame, idCol: String, sizeCol: String,
                      capacity: Long, chunkDocs: Long = 1L << 20): DataFrame = {
    require(capacity >= 1, s"packBinsNextFit: capacity must be >= 1, got $capacity")
    require(chunkDocs >= 1, s"packBinsNextFit: chunkDocs must be >= 1, got $chunkDocs")
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs
      .select(col(idCol).cast("long").as("id"), col(sizeCol).cast("long").as("n"))
      .where(col("n") > 0)
    val chunked = graft.ops.Scans
      .globalRowNumber(base, "id", "__rank")
      .withColumn("__chunk", ((col("__rank") - 1) / chunkDocs).cast("long"))
      .repartition(col("__chunk"))
      .sortWithinPartitions(col("__chunk"), col("id"))
      .select(col("__chunk"), col("id"), col("n"))
      .as[(Long, Long, Long)]
    chunked.mapPartitions { it =>
      var chunk = Long.MinValue
      var binId = 0L
      var fill = Long.MaxValue // forces a fresh bin on the first row
      it.map { case (c, id, n) =>
        if (c != chunk || fill + n > capacity) {
          chunk = c; binId = id; fill = n
          (id, n, binId, 0L)
        } else {
          val off = fill; fill += n
          (id, n, binId, off)
        }
      }
    }.toDF(idCol, "n_units", "bin_id", "offset_in_bin")
  }

  private def tokenized(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val base = docs
      .select(col(idCol).cast("long").as("id"),
        TextOps.tokens(col(textCol)).as("__toks"))
      .where(col("__toks") =!= array(lit(""))) // zero-token docs occupy no space
      .withColumn("__n", size(col("__toks")).cast("long"))
    graft.ops.Scans.exclusivePrefixSum(base, "id", "__n", "__off")
  }

  /** The exact (window, document) SEGMENT map of concat-and-chunk
    * packing — [[packSequences]] says which windows a doc touches
    * (`seq_first`..`seq_last`); this says precisely which token slice
    * lands where: one row per (window, doc) overlap with `doc_start`
    * (0-based offset into the doc), `seq_start` (0-based offset into
    * the window) and the segment's `n_tokens`. This is the record a
    * data loader replays to reconstruct any window without re-running
    * the scan — and the provenance needed to answer "which documents
    * fed training step N".
    *
    * Per doc the segment rows cover its tokens exactly once; per window
    * the segments tile [0, ctxLen) contiguously (the final window may
    * end short). Same plan shape as [[packSequences]] plus one
    * explode — still no single-partition stage. */
  def packSegments(docs: DataFrame, idCol: String, textCol: String,
                   ctxLen: Int): DataFrame =
    packSegmentsWithToks(docs, idCol, textCol, ctxLen)
      .select(col("seq_id"), col("id").as(idCol), col("doc_start"),
        col("seq_start"), col("n_tokens"))

  private def packSegmentsWithToks(docs: DataFrame, idCol: String,
                                   textCol: String, ctxLen: Int): DataFrame = {
    require(ctxLen >= 1, s"packSegments: ctxLen must be >= 1, got $ctxLen")
    tokenized(docs, idCol, textCol)
      .withColumn("seq_id", explode(sequence(
        expr(s"__off DIV $ctxLen"),
        expr(s"(__off + __n - 1) DIV $ctxLen"))))
      .withColumn("__seg_start", greatest(col("__off"), col("seq_id") * ctxLen))
      .withColumn("__seg_end",
        least(col("__off") + col("__n"), (col("seq_id") + 1) * ctxLen))
      .select(col("seq_id"), col("id"),
        (col("__seg_start") - col("__off")).as("doc_start"),
        (col("__seg_start") - col("seq_id") * ctxLen).as("seq_start"),
        (col("__seg_end") - col("__seg_start")).as("n_tokens"),
        col("__toks"))
  }

  /** Materialized context windows: `seq_id`, `n_docs` (documents
    * contributing), `n_tokens` (== ctxLen for every window but the
    * last) and `seq_text` — the window's tokens space-joined in stream
    * order. The groupBy key is the window id, so groups are <= ctxLen
    * tokens BY CONSTRUCTION: document-length skew cannot produce a hot
    * key, the aggregation is perfectly balanced at any corpus size. */
  def packWindows(docs: DataFrame, idCol: String, textCol: String,
                  ctxLen: Int): DataFrame =
    packSegmentsWithToks(docs, idCol, textCol, ctxLen)
      .withColumn("__seg", slice(col("__toks"),
        (col("doc_start") + 1).cast("int"), col("n_tokens").cast("int")))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        array_join(flatten(transform(
          sort_array(collect_list(struct(col("seq_start"), col("__seg")))),
          s => s.getField("__seg"))), " ").as("seq_text"))
}
