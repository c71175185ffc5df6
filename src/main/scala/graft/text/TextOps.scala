package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis + deduplication operators for large-scale training-data
  * pipelines (SURVEY.md §7.5 — beyond reference parity, first-class).
  *
  * Everything here is built from codegen'd Catalyst expressions (no UDFs);
  * the shapes are designed for the 100 TB path: per-row column transforms,
  * one shuffle on band hashes for LSH candidate generation, broadcast of
  * the small stopword lists.
  */
object TextOps {

  // ------------------------------------------------------------ tokenizing

  /** Lowercase, collapse whitespace. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Whitespace tokens of the normalized text. */
  def tokens(c: Column): Column = split(normalizeText(c), " ")

  /** BPE-ish subword split: word chunks + standalone punctuation,
    * mirroring common pre-tokenizers. */
  def bpeishTokens(c: Column): Column =
    regexp_extract_all(c, lit("\\w+|[^\\w\\s]"), lit(0))

  /** Sliding-window chunking: split each document into `chunkSize`-token
    * windows advancing by `chunkSize - overlap`, the context-window prep
    * step between cleaning and packing. Every document yields >= 1 chunk
    * (short docs one partial chunk); consecutive chunks share `overlap`
    * tokens so no boundary context is lost. Pure per-row explode over
    * codegen'd array ops — embarrassingly parallel, chunk count per row
    * bounded by n_tokens/stride, no shuffle. */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
                chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkDocs: chunkSize must be >= 1, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"chunkDocs: overlap must be in [0, chunkSize), got $overlap")
    val stride = chunkSize - overlap
    df.withColumn("__toks", tokens(col(textCol)))
      .withColumn("chunk_id", explode(sequence(lit(0L),
        greatest(ceil((size(col("__toks")) - chunkSize) / lit(stride.toDouble)),
          lit(0L)).cast("long"))))
      .select(col(idCol), col("chunk_id"),
        array_join(slice(col("__toks"), (col("chunk_id") * stride + 1).cast("int"),
          lit(chunkSize)), " ").as("chunk_text"),
        size(slice(col("__toks"), (col("chunk_id") * stride + 1).cast("int"),
          lit(chunkSize))).cast("long").as("chunk_tokens"))
  }

  /** Sentence split of normalized text, RE2-safe: the end-of-sentence
    * punctuation is KEPT with its sentence by rewriting "<.!?> " to
    * "<.!?>" with a capture-group backreference (no lookbehind —
    * the same discipline as the HTML ops, so the DuckDB oracle can use
    * the identical pattern). */
  def sentences(c: Column): Column =
    split(regexp_replace(normalizeText(c), "([.!?]) ", "$1\u0001"), "\u0001")

  /** Sentence-boundary-aware chunking — the RAG-shaped sibling of
    * [[chunkDocs]]: sentences are packed GREEDILY into chunks of at most
    * `maxTokens` whitespace tokens, never splitting a sentence (a
    * sentence longer than `maxTokens` gets a chunk of its own), so every
    * chunk is a run of consecutive whole sentences. Output: (id,
    * chunk_id, chunk_text, chunk_tokens), chunk_id 0-based per doc;
    * every document yields >= 1 chunk (an empty doc one empty chunk),
    * matching the [[chunkDocs]] invariant.
    *
    * The greedy fill is a conditional-reset running sum — NOT a prefix
    * sum — but unlike bin packing it resets per DOCUMENT, so it stays a
    * row-local `aggregate` fold over the sentence array: pure
    * projection + explode, embarrassingly parallel, no shuffle, chunk
    * assembly bounded by (sentences per doc)^2 array work in the worst
    * case. Oracle twin: the same fold as a DuckDB recursive CTE. */
  def chunkSentences(df: DataFrame, idCol: String, textCol: String,
                     maxTokens: Int): DataFrame = {
    require(maxTokens >= 1, s"chunkSentences: maxTokens must be >= 1, got $maxTokens")
    val over = s"(acc.cum > 0 AND acc.cum + n > $maxTokens)"
    df.withColumn("__sents", sentences(col(textCol)))
      .withColumn("__asg", expr(
        s"""aggregate(
              transform(__sents, s -> IF(s = '', 0, size(split(s, ' ')))),
              named_struct('chunk', 0, 'cum', 0,
                           'asg', cast(array() as array<int>)),
              (acc, n) -> named_struct(
                'chunk', IF($over, acc.chunk + 1, acc.chunk),
                'cum',   IF($over, n, acc.cum + n),
                'asg',   concat(acc.asg,
                           array(IF($over, acc.chunk + 1, acc.chunk)))),
              acc -> acc.asg)"""))
      .withColumn("__chunks", expr(
        """transform(sequence(0, element_at(__asg, -1)), c ->
             array_join(
               transform(filter(arrays_zip(__sents, __asg), p -> p.__asg = c),
                 p -> p.__sents), ' '))"""))
      .select(col(idCol), posexplode(col("__chunks")).as(Seq("chunk_id", "chunk_text")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        col("chunk_text"),
        when(col("chunk_text") === "", lit(0L))
          .otherwise(size(split(col("chunk_text"), " ")).cast("long"))
          .as("chunk_tokens"))
  }

  /** C4-style global line dedup (Raffel et al. JMLR'20 §2.2 discards
    * all but one occurrence of any repeated span; RefinedWeb applies the
    * same rule per line): every non-blank line keeps only its FIRST
    * occurrence corpus-wide — first by (doc id, line position), the
    * engine-reproducible order — and later copies are dropped; blank
    * lines always survive. Documents are reassembled in original line
    * order, and a document whose every line was dropped comes back with
    * empty text instead of vanishing. Output: (id, textCol).
    *
    * Scale: one shuffle keyed on the line text for the first-occurrence
    * window (row_number is a streaming frame — no buffering), one
    * shuffle on doc id to reassemble; no joins besides the final
    * broadcast-shaped left join that restores empty docs. A single
    * boilerplate line repeated across a large fraction of a 100 TB
    * corpus is one hot window partition — prefilter such lines with a
    * frequency pass if the corpus is known to carry one. */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String,
                 sep: String = "\n"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = docs.select(col(idCol).as("id"),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "line")))
    val firstSeen = Window.partitionBy(col("line")).orderBy(col("id"), col("pos"))
    val kept = lines.withColumn("rn", row_number().over(firstSeen))
      .where(col("rn") === 1 || trim(col("line")) === "")
    val rebuilt = kept.groupBy(col("id"))
      .agg(array_join(
        expr("transform(array_sort(collect_list(struct(pos, line))), s -> s.line)"),
        sep).as("__text"))
    docs.select(col(idCol).as("id")).join(rebuilt, Seq("id"), "left")
      .select(col("id"), coalesce(col("__text"), lit("")).as(textCol))
  }

  /** Exact substring deduplication at token grain — the distributed
    * re-expression of Lee et al., ACL'22 ("Deduplicating Training Data
    * Makes Language Models Better", the suffix-array ExactSubstr tool):
    * any token span of at least `minTokens` tokens that also occurs
    * EARLIER in the corpus is cut out, where "earlier" is the
    * engine-reproducible (doc id, token position) order; documents
    * reassemble from their surviving tokens (single-space joined — the
    * token-grain analogue of the paper's byte splice, over
    * [[normalizeText]] tokens). Documents with no duplicated span keep
    * their text verbatim; a fully-duplicated document comes back with
    * empty text instead of vanishing.
    *
    * Why this equals the suffix-array semantics with no suffix array: a
    * repeated span of m >= L tokens is exactly the union of its aligned
    * L-token windows, each of which repeats — and conversely every
    * repeated L-window lies inside a repeated span. So marking every
    * (doc, pos) whose L-gram has an earlier corpus twin covers
    * precisely the non-first copies of every maximal repeat, and a
    * running max over marked window ends decides per token whether any
    * marked window still covers it.
    *
    * Scale shape (the 100 TB path):
    *  1. the corpus-wide shuffle is keyed on a 128-bit gram digest
    *     (`unhex(md5(gram))` — 16 bytes instead of a 50-token string;
    *     64-bit keys would already expect birthday collisions at
    *     trillions of grams, and a collision here DELETES text);
    *     row_number is a streaming window frame, no buffering;
    *  2. marked positions are only the duplicated windows — usually a
    *     tiny fraction — and ride a doc-keyed union with the token
    *     stream, so the coverage pass is one doc-id shuffle of tokens
    *     plus a streaming running-max frame (same shape as
    *     [[dedupLines]]); the reassembly groupBy reuses that
    *     partitioning;
    *  3. everything per-row is codegen'd array/string ops — no UDFs.
    */
  def dedupSubstrings(docs: DataFrame, idCol: String, textCol: String,
                      minTokens: Int = 50): DataFrame =
    rebuildFromMarks(
      docs.select(col(idCol).as("id"), col(textCol).as("__orig"),
        tokens(col(textCol)).as("__toks")),
      markedWindows(docs, idCol, textCol, minTokens), minTokens, textCol)

  /** The cut-and-reassemble tail shared with [[SubstrIndex]]: given
    * `base` = (id, __orig, __toks) and `marked` = (id, pos) duplicated
    * window starts (duplicate mark rows tolerated — the running max
    * absorbs them), rebuild every marked doc from its surviving tokens
    * and pass every unmarked doc through verbatim. Output (id, textCol).
    *
    * Only MARKED docs enter the explode/coverage/reassembly path (a
    * semi-join against the distinct marked ids up front): on a typical
    * corpus a few percent of docs carry duplicated spans, and exploding
    * the other ~95% only to throw their rebuilt text away at the
    * passthrough would make the doc-id shuffle corpus-sized instead of
    * changed-doc-sized. */
  private[text] def rebuildFromMarks(base: DataFrame, marked: DataFrame,
                                     minTokens: Int,
                                     textCol: String): DataFrame = {
    val changed = marked.select(col("id")).distinct()
      .withColumn("__hit", lit(true))
    val changedBase = base
      .join(changed.select(col("id")), Seq("id"), "left_semi")
    val rebuilt = coveredKeepTokens(changedBase, marked, minTokens)
      .groupBy(col("id"))
      .agg(array_join(
        expr("transform(array_sort(collect_list(struct(pos, tok))), s -> s.tok)"),
        " ").as("__text"))
    base.join(rebuilt, Seq("id"), "left").join(changed, Seq("id"), "left")
      .select(col("id"),
        when(col("__hit"), coalesce(col("__text"), lit("")))
          .otherwise(col("__orig")).as(textCol))
  }

  /** Corpus-level effect summary for [[dedupSubstrings]] at the same
    * `minTokens`: one row of (docs, docs_changed, tokens_total,
    * tokens_removed, windows_marked). Same two shuffles as the dedup
    * itself; run it to size a cut before committing to one. */
  def substringDedupStats(docs: DataFrame, idCol: String, textCol: String,
                          minTokens: Int = 50): DataFrame = {
    val marked = markedWindows(docs, idCol, textCol, minTokens)
    val base = docs.select(col(idCol).as("id"),
      tokens(col(textCol)).as("__toks"))
    // the coverage pass runs over MARKED docs only (the rebuildFromMarks
    // semi-join discipline): unmarked docs contribute zero removals
    val changedBase = base
      .join(marked.select(col("id")).distinct(), Seq("id"), "left_semi")
    val keptPerDoc = coveredKeepTokens(changedBase, marked, minTokens)
      .groupBy(col("id")).agg(count(lit(1)).as("kept"))
    val changedTok = changedBase
      .select(col("id"), size(col("__toks")).cast("long").as("n"))
      .join(keptPerDoc, Seq("id"), "left")
      .agg(count(lit(1)).as("docs_changed"),
        sum(col("n") - coalesce(col("kept"), lit(0L))).as("tokens_removed"))
    val totals = base.agg(count(lit(1)).as("docs"),
      sum(size(col("__toks"))).as("tokens_total"))
    val nMarked = marked.agg(count(lit(1)).as("windows_marked"))
    totals.crossJoin(changedTok).crossJoin(nMarked)
      .select(col("docs"), col("docs_changed"), col("tokens_total"),
        coalesce(col("tokens_removed"), lit(0L)).as("tokens_removed"),
        col("windows_marked"))
  }

  /** Duplicated `minTokens`-token windows: every (id, pos) whose gram
    * digest has an earlier ((id, pos)-ordered) corpus occurrence. */
  private def markedWindows(docs: DataFrame, idCol: String,
                            textCol: String, minTokens: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(minTokens >= 2,
      s"dedupSubstrings: minTokens must be >= 2, got $minTokens")
    val grams = docs.select(col(idCol).as("id"),
      posexplode(wordShingles(tokens(col(textCol)), minTokens))
        .as(Seq("pos", "gram")))
      .select(col("id"), col("pos"), unhex(md5(col("gram"))).as("gk"))
    val firstSeen = Window.partitionBy(col("gk"))
      .orderBy(col("id"), col("pos"))
    grams.withColumn("rn", row_number().over(firstSeen))
      .where(col("rn") > 1).select(col("id"), col("pos"))
  }

  /** Tokens that survive the cut: union the token stream with the
    * marked window starts, run the streaming per-doc running max of
    * window ends (mark rows sort BEFORE the token at the same
    * position, so a window covers its own start), keep tokens past
    * every end seen so far. Output: (id, pos, tok) of kept tokens. */
  private def coveredKeepTokens(base: DataFrame, marked: DataFrame,
                                minTokens: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = base.select(col("id"),
      posexplode(col("__toks")).as(Seq("pos", "tok")))
      .withColumn("kind", lit(1))
    val u = toks.select(col("id"), col("pos"), col("kind"), col("tok"))
      .unionByName(marked.select(col("id"), col("pos"), lit(0).as("kind"),
        lit(null).cast("string").as("tok")))
    val cover = Window.partitionBy(col("id"))
      .orderBy(col("pos"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("covend",
        max(when(col("kind") === 0, col("pos") + minTokens)).over(cover))
      .where(col("kind") === 1 &&
        (col("covend").isNull || col("pos") >= col("covend")))
      .select(col("id"), col("pos"), col("tok"))
  }

  /** Word n-gram shingles (n consecutive tokens joined by a space);
    * empty/short docs produce an empty array. A fused expression — the
    * transform(sequence)/slice/concat_ws composition is an interpreted
    * higher-order function and dominated corpus-wide shingle scans. */
  def wordShingles(toks: Column, n: Int): Column =
    graft.functions.TextExpressions.word_shingles(toks, n)

  // ---------------------------------------------------------------- minhash

  /** MinHash signature — a custom Catalyst expression (one tight loop per
    * row; see [[graft.functions.MinHashSignature]] for why composition of
    * built-in higher-order functions is not viable here). */
  def minhashSignature(shingles: Column, numPerm: Int): Column =
    graft.functions.TextExpressions.minhash_signature(shingles, numPerm)

  /** LSH band hashes: the signature is cut into `bands` bands of
    * `rowsPerBand`; each band folds its longs with a polynomial mix
    * (seeded by the band index) — pure long arithmetic, no string
    * round-trips. */
  def lshBandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    graft.functions.TextExpressions.lsh_bands(sig, bands, rowsPerBand)

  /** Candidate near-duplicate pairs via MinHash+LSH banding, verified with
    * exact Jaccard over the shingle sets.
    *
    * Scale shape (the 100 TB path):
    *  1. signatures: one CPU-bound pass, repartitioned by id;
    *  2. band self-join on (band_index, band_hash) — the only wide
    *     shuffle, uniform because band hashes distribute uniformly;
    *  3. `maxBucket` caps pathological buckets: a band value shared by
    *     hundreds of documents carries no dedup information but would
    *     produce O(n^2) pairs — standard LSH practice is to drop them
    *     (they resurface through their other, more selective bands);
    *  4. a cheap signature-agreement estimate (64 long comparisons)
    *     prefilters pairs BEFORE shuffling the much heavier shingle
    *     sets for the exact-Jaccard verify.
    *
    * Band-count default: the LSH S-curve crosses 50% detection near
    * (1/bands)^(bands/numPerm); with 64 perms, bands=16 (4 rows/band)
    * centers that at J≈0.5 — matching the default `threshold` — while
    * bands=8 (8 rows/band) centers at J≈0.77 and silently LOSES most
    * pairs in [0.5, 0.75] (recall ~3% at J=0.5). Callers tuning
    * `threshold` should keep rowsPerBand ≈ log(bands)/-log(threshold). */
  def minhashDedupPairs(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, numPerm: Int = 64,
                        bands: Int = 16, threshold: Double = 0.5,
                        maxBucket: Int = 100,
                        repartitionInput: Boolean = true): DataFrame = {
    val rowsPerBand = numPerm / bands
    // repartition by id up front: small inputs arrive as one file = one
    // partition, and the signature compute is per-row CPU-bound. The
    // signature comes from the fused shingle+hash expression (one tight
    // loop per document); shingle SETS are only materialized later, for
    // the handful of candidate pairs that survive the estimate filter.
    // repartitionInput=false is an opt-out for callers who KNOW their
    // input is well spread — note that a cached frame downstream of a
    // small shuffle is usually NOT (AQE coalesces it to a few
    // partitions, serializing the signature pass), which is why
    // nearDupPipeline keeps the default true.
    val base = tokenFiltered(docs, idCol, textCol, shingleN, repartitionInput)
    val withSig = signatures(base, shingleN, numPerm, bands, rowsPerBand)
    val banded = withSig.select(col("id"),
      posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    val candidates = bucketPairs(banded, maxBucket)
    // signature-agreement estimate: unbiased Jaccard estimator, 64 longs
    // per side instead of the full shingle sets
    val sigs = withSig.select(col("id"), col("sig"))
    // pinned: the surviving pair set feeds THREE consumers (the two
    // survivor-id branches and the verify join) — left lazy, the whole
    // candidate+estimate subtree (bucket aggregation, distinct, two
    // signature joins) is PLANNED 3x into one consumer query, and each
    // copy becomes its own chain of AQE stages (measured: 52 Exchange
    // nodes for one call, no ReusedExchange in the initial plan). The
    // pair set is small by construction (bucket-capped), so the pin is
    // one cheap job that collapses ~2/3 of the query's stages.
    val estimated = candidates
      .join(sigs.withColumnRenamed("id", "id_a").withColumnRenamed("sig", "sig_a"), "id_a")
      .join(sigs.withColumnRenamed("id", "id_b").withColumnRenamed("sig", "sig_b"), "id_b")
      // sig_agreement kernel: the zip_with/aggregate HOF composition is
      // interpreted (CodegenFallback) — numPerm boxed iterations x 2
      // per pair; the kernel is one codegen'd loop, value-identical
      // (KernelEquivalenceSpec)
      .withColumn("est",
        graft.functions.TextExpressions.sig_agreement(
          col("sig_a"), col("sig_b")).cast("double") / numPerm)
      .where(col("est") >= threshold * 0.5)
      .select(col("id_a"), col("id_b"))
      .transform(graft.ops.Pins.pin)
    // exact-verify sets: computed ONLY for ids that appear in surviving
    // candidate pairs (a left-semi probe), not for the whole corpus
    val survivorIds = estimated.select(col("id_a").as("id"))
      .union(estimated.select(col("id_b").as("id"))).distinct()
    val sets = base.join(survivorIds, Seq("id"), "left_semi")
      .select(col("id"),
        array_distinct(wordShingles(tokens(col("text")), shingleN)).as("sset"))
    estimated
      .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("sset", "set_a"), "id_a")
      .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("sset", "set_b"), "id_b")
      // |A ∪ B| = |A| + |B| - |A ∩ B| (sets are array_distinct'ed):
      // one hash-set pass per pair instead of two, and no union array
      // is ever materialized
      .withColumn("__inter", size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("jaccard",
        col("__inter").cast("double") /
          (size(col("set_a")) + size(col("set_b")) - col("__inter")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Near-SUBSET pairs by shingle containment — the asymmetric member of
    * the dedup family: C(A in B) = |S_A ∩ S_B| / |S_A|. A short document
    * quoted whole inside a long one has C ≈ 1 but Jaccard ≈ |A|/|B|, so
    * every symmetric detector (MinHash/SimHash/Jaccard thresholds)
    * misses exactly the boilerplate-wrapped copies and quote-expansions
    * this flags. Output: (id_a, id_b, cont_a_in_b, cont_b_in_a) for
    * pairs where EITHER direction reaches `threshold` (id_a < id_b).
    *
    * `exhaustive = true` verifies every id<id pair — exact by
    * construction, quadratic, the oracle-gated validation mode (cap the
    * input). Default mode takes candidates from the same capped LSH
    * banding as [[minhashDedupPairs]] but SKIPS its signature-agreement
    * prefilter: that estimator tracks Jaccard, and pruning on it would
    * re-lose the low-J/high-C pairs this operator exists for. Recall
    * caveat, stated honestly: banding collision probability is a
    * function of JACCARD, so a tiny doc inside a huge one (J = |A|/|B|)
    * may never share a band — raise `bands` (fewer rows per band) to
    * push recall toward the low-J corner; the spec pins the shapes both
    * modes catch. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       shingleN: Int = 3, threshold: Double = 0.8,
                       numPerm: Int = 64, bands: Int = 32,
                       maxBucket: Int = 100,
                       exhaustive: Boolean = false): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"containmentPairs: threshold must be in (0, 1], got $threshold")
    val base = tokenFiltered(docs, idCol, textCol, shingleN,
      repartitionInput = true)
    // pinned once: the pair set feeds BOTH the candidate-id semi-probe
    // below and the verify joins — unpinned, the banding aggregation
    // (or the exhaustive cross join) would re-run per consumer
    val candidates = (
      if (exhaustive) {
        val ids = base.select(col("id")).transform(graft.ops.Pins.pin)
        ids.select(col("id").as("id_a"))
          .crossJoin(ids.select(col("id").as("id_b")))
          .where(col("id_a") < col("id_b"))
      } else {
        val rowsPerBand = numPerm / bands
        require(rowsPerBand >= 1,
          s"containmentPairs: bands ($bands) must divide numPerm ($numPerm)")
        val withSig = signatures(base, shingleN, numPerm, bands, rowsPerBand)
        val banded = withSig.select(col("id"),
          posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
        bucketPairs(banded, maxBucket)
      }).transform(graft.ops.Pins.pin)
    // shingle sets ONLY for ids that appear in candidate pairs (the
    // same candidate-bounded discipline as minhashDedupPairs's verify
    // stage): under LSH candidates are a sliver of the corpus, and
    // materializing every document's set would make the verify stage a
    // full-corpus CPU pass regardless of how few pairs survived banding
    val candidateIds = candidates.select(col("id_a").as("id"))
      .union(candidates.select(col("id_b").as("id"))).distinct()
    val sets = base.join(candidateIds, Seq("id"), "left_semi")
      .select(col("id"),
        array_distinct(wordShingles(tokens(col("text")), shingleN)).as("sset"))
    candidates
      .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("sset", "set_a"), "id_a")
      .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("sset", "set_b"), "id_b")
      .withColumn("__inter",
        size(array_intersect(col("set_a"), col("set_b"))).cast("double"))
      .withColumn("cont_a_in_b", col("__inter") / size(col("set_a")).cast("double"))
      .withColumn("cont_b_in_a", col("__inter") / size(col("set_b")).cast("double"))
      .where(greatest(col("cont_a_in_b"), col("cont_b_in_a")) >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("cont_a_in_b"), 4).as("cont_a_in_b"),
        round(col("cont_b_in_a"), 4).as("cont_b_in_a"))
  }

  /** (id, text) with short docs dropped and the input spread by id (small
    * inputs arrive as one file = one partition, and the signature compute
    * is per-row CPU-bound). */
  private def tokenFiltered(docs: DataFrame, idCol: String, textCol: String,
                            shingleN: Int, repartitionInput: Boolean): DataFrame = {
    val projected = docs.select(col(idCol).as("id"), col(textCol).as("text"))
    (if (repartitionInput) projected.repartition(col("id")) else projected)
      .where(size(tokens(col("text"))) >= shingleN)
  }

  /** (id, sig, bands), eagerly localCheckpoint'ed — NOT persist+count: the
    * banding branch and the signature probes all sit in ONE consumer
    * query; left lazy they race to materialize and the CPU-bound
    * signature pass over the whole corpus runs 2-3x. Checkpointing
    * materializes once (MEMORY_AND_DISK blocks) AND — unlike a
    * Dataset.persist, whose CacheManager entry is strongly held until an
    * explicit unpersist — the blocks are released by the ContextCleaner
    * once the frame is unreferenced, so repeated calls from a long-lived
    * session don't accumulate cached blocks. */
  private def signatures(base: DataFrame, shingleN: Int, numPerm: Int,
                         bands: Int, rowsPerBand: Int,
                         checkpoint: Boolean = true): DataFrame = {
    val sig = base
      .select(col("id"),
        graft.functions.TextExpressions.minhash_shingles(
          tokens(col("text")), shingleN, numPerm).as("sig"))
      .withColumn("bands", lshBandHashes(col("sig"), bands, rowsPerBand))
    if (checkpoint) sig.transform(graft.ops.Pins.pin) else sig
  }

  /** Bucket-local candidate-pair generation shared by the MinHash and
    * SimHash LSH paths: group ids per (band, hash), drop oversized
    * buckets (a band value shared by hundreds of documents carries no
    * dedup signal but would produce O(n^2) pairs), and emit the pairs by
    * array combinatorics INSIDE each bounded bucket — one shuffle instead
    * of window + self-join + join-shuffles; output is bounded by
    * maxBucket^2 per bucket. Input: (id, band_idx, band_hash). */
  private def bucketPairs(banded: DataFrame, maxBucket: Int): DataFrame =
    banded
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(collect_list(col("id")).as("ids"))
      .where(size(col("ids")).between(2, maxBucket))
      .select(explode(expr(
        """flatten(transform(ids,
             x -> transform(filter(ids, y -> y > x),
                            y -> struct(x AS id_a, y AS id_b))))""")).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()

  /** Cross-corpus MinHash near-duplicate pairs: (left id, right id)
    * pairs with exact shingle-Jaccard >= threshold, candidates found by
    * banding BETWEEN the two corpora — the incremental-dedup /
    * near-dup-decontamination shape: new data (or a training corpus) is
    * checked against an existing index (or an eval benchmark) WITHOUT
    * re-pairing either side against itself.
    *
    * Scale: when the right side is small (a benchmark, a daily delta) its
    * banded signatures broadcast and the big left side never shuffles at
    * all — candidates stream out of the scan; only the (small) candidate
    * pair set is ever exchanged. Both sides bounded, the band join is the
    * only wide operation. Same total-recall-at-high-J property as the
    * self-join path (r=4 bands), same exact-verify final filter.
    *
    * `checkpointLeft` (default false): by default the big left side's
    * signatures are NOT materialized — they stream through the band join
    * once, only the (small) candidate pair set is pinned, and the
    * estimate stage recomputes signatures for candidate survivors alone
    * via a semi-probe. At 100 TB that trades a second (filtered) scan of
    * the left corpus for not writing the full corpus's signatures to
    * executor storage — the right default when candidates are rare.
    * Set true to materialize the left signatures once and reuse them
    * (the self-join discipline), e.g. when most of the left side is
    * expected to be a candidate. The small right side is always
    * checkpointed (it has two consumers either way). */
  def minhashCrossDupPairs(left: DataFrame, right: DataFrame,
                           idCol: String, textCol: String,
                           shingleN: Int = 3, numPerm: Int = 64,
                           bands: Int = 16, threshold: Double = 0.5,
                           broadcastRight: Boolean = true,
                           checkpointLeft: Boolean = false): DataFrame = {
    val rowsPerBand = numPerm / bands
    val lBase = tokenFiltered(left, idCol, textCol, shingleN, repartitionInput = true)
    val rBase = tokenFiltered(right, idCol, textCol, shingleN, repartitionInput = true)
    val lSig = signatures(lBase, shingleN, numPerm, bands, rowsPerBand,
      checkpoint = checkpointLeft)
    val rSig = signatures(rBase, shingleN, numPerm, bands, rowsPerBand)
    def banded(sig: DataFrame): DataFrame =
      sig.select(col("id"), posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    val rBanded0 = banded(rSig).withColumnRenamed("id", "id_r")
    val rBanded = if (broadcastRight) broadcast(rBanded0) else rBanded0
    val candidates0 = banded(lSig).withColumnRenamed("id", "id_l")
      .join(rBanded, Seq("band_idx", "band_hash"))
      .select(col("id_l"), col("id_r"))
      .distinct()
    // with lazy left signatures, pin the small candidate set instead so
    // the full-corpus scan runs exactly once per consumer chain
    val candidates = if (checkpointLeft) candidates0 else candidates0.transform(graft.ops.Pins.pin)
    val lSigForEst =
      if (checkpointLeft) lSig.select(col("id").as("id_l"), col("sig").as("sig_l"))
      else signatures(
          lBase.join(candidates.select(col("id_l").as("id")).distinct(),
            Seq("id"), "left_semi"),
          shingleN, numPerm, bands, rowsPerBand, checkpoint = false)
        .select(col("id").as("id_l"), col("sig").as("sig_l"))
    // signature-agreement estimate, then exact verify over shingle sets —
    // both computed only for surviving candidates
    val estimated = candidates
      .join(lSigForEst, "id_l")
      .join(rSig.select(col("id").as("id_r"), col("sig").as("sig_r")), "id_r")
      // sig_agreement kernel — see minhashDedupPairs's estimate note
      .withColumn("est",
        graft.functions.TextExpressions.sig_agreement(
          col("sig_l"), col("sig_r")).cast("double") / numPerm)
      .where(col("est") >= threshold * 0.5)
      .select(col("id_l"), col("id_r"))
    def sets(base: DataFrame, ids: DataFrame): DataFrame =
      base.join(ids, Seq("id"), "left_semi")
        .select(col("id"),
          array_distinct(wordShingles(tokens(col("text")), shingleN)).as("sset"))
    val lSets = sets(lBase, estimated.select(col("id_l").as("id")).distinct())
    val rSets = sets(rBase, estimated.select(col("id_r").as("id")).distinct())
    estimated
      .join(lSets.select(col("id").as("id_l"), col("sset").as("set_l")), "id_l")
      .join(rSets.select(col("id").as("id_r"), col("sset").as("set_r")), "id_r")
      // |A ∪ B| arithmetic identity — see minhashDedupPairs's verify
      .withColumn("__inter", size(array_intersect(col("set_l"), col("set_r"))))
      .withColumn("jaccard",
        col("__inter").cast("double") /
          (size(col("set_l")) + size(col("set_r")) - col("__inter")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("id_l"), col("id_r"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Near-dup-level benchmark decontamination: drops documents that
    * EXACTLY match a benchmark doc (normalized fingerprint — catches
    * short docs below the shingle floor too) or are NEAR-duplicates of
    * one (cross-corpus MinHash at `threshold`) — the sweep labs actually
    * run before training, since eval contamination rarely survives
    * verbatim. Both probes broadcast the benchmark side; the corpus
    * streams through once per probe and is never shuffled. */
  def decontaminateNearDup(docs: DataFrame, benchmark: DataFrame,
                           idCol: String, textCol: String, benchTextCol: String,
                           shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    val exact = decontaminate(docs, benchmark, textCol, benchTextCol)
    // the benchmark side only needs SOME deterministic id; it is small by
    // assumption, so the single-partition window is a non-issue
    val bench = benchmark.select(
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col(benchTextCol))).cast("long").as(idCol),
      col(benchTextCol).as(textCol))
    val hitIds = minhashCrossDupPairs(
        exact.select(col(idCol), col(textCol)), bench,
        idCol = idCol, textCol = textCol,
        shingleN = shingleN, threshold = threshold)
      .select(col("id_l").as("__hit_id")).distinct()
    exact.join(hitIds, col(idCol) === col("__hit_id"), "left_anti")
  }

  /** SimHash near-duplicate pairs: ALL pairs whose 64-bit shingle-SimHash
    * signatures differ in at most `maxHamming` bits, found by splitting
    * the signature into `maxHamming + 1` equal-width chunks and matching
    * on any chunk — by pigeonhole, two signatures within the radius MUST
    * agree on at least one whole chunk, so banding recall is total BY
    * CONSTRUCTION (not probabilistic like MinHash banding); the exact
    * `bit_count(xor)` check then filters the chunk-collision false
    * positives. Output: (id_a, id_b, hamming).
    *
    * Complements [[minhashDedupPairs]]: MinHash estimates set Jaccard
    * (order-free), SimHash hamming tracks weighted feature overlap with a
    * fixed 64-bit sketch per document — 8 bytes of state regardless of
    * document size, the cheapest near-dup index that exists.
    *
    * Scale: one CPU-bound signature pass, one shuffle on (chunk_idx,
    * chunk_value) — same shape as the MinHash path. Chunk keys carry
    * 64/(maxHamming+1) bits of entropy (16 bits at the default radius 3);
    * at billions of documents a single 16-bit table saturates and the
    * standard fix is the block-combination scheme of Manku et al.,
    * "Detecting Near-Duplicates for Web Crawling" (WWW'07) — combine
    * chunk PAIRS into wider keys at the cost of C(chunks, 2) tables.
    * `maxBucket` bounds the damage of saturated buckets meanwhile; note
    * that unlike MinHash (where a dropped bucket's pairs resurface
    * through other bands) dropping a bucket here can lose pairs whose
    * other chunks are all dirty, so the cap defaults high and the audit
    * is the bucket-size distribution, not silence. */
  def simhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          shingleN: Int = 3, maxHamming: Int = 3,
                          maxBucket: Int = 1000): DataFrame = {
    require(maxHamming >= 0 && 64 % (maxHamming + 1) == 0,
      s"maxHamming + 1 must divide 64, got $maxHamming")
    val nChunks = maxHamming + 1
    val width = 64 / nChunks
    // maxHamming=0 means one 64-bit chunk: (1L << 64) wraps to 1 (Scala
    // shifts mod 64), which would zero the mask and collapse every
    // band_hash into one oversized bucket that the cap then drops — the
    // exact-signature case would silently return no pairs
    val mask = if (width == 64) -1L else (1L << width) - 1L
    val base = docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .repartition(col("id"))
      .where(size(tokens(col("text"))) >= shingleN)
    // eager localCheckpoint for the same reason as the MinHash path: the
    // banding branch and the signature probe share one consumer query
    val withSig = base
      .select(col("id"),
        graft.functions.TextExpressions.simhash64(
          wordShingles(tokens(col("text")), shingleN)).as("sig"))
      .transform(graft.ops.Pins.pin)
    // (sig >> (j*width)) & mask: the arithmetic shift's sign-extension is
    // masked off, so it equals the logical shift for every chunk
    val banded = withSig.select(col("id"),
      posexplode(expr(
        s"transform(sequence(0, ${nChunks - 1}), j -> (sig >> (j * $width)) & $mask)"))
        .as(Seq("band_idx", "band_hash")))
    val sigs = withSig.select(col("id"), col("sig"))
    bucketPairs(banded, maxBucket)
      .join(sigs.withColumnRenamed("id", "id_a").withColumnRenamed("sig", "sig_a"), "id_a")
      .join(sigs.withColumnRenamed("id", "id_b").withColumnRenamed("sig", "sig_b"), "id_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Staged dedup pipeline — the 100 TB shape: exact duplicates are
    * collapsed FIRST with a cheap fingerprint group (a web-scale corpus is
    * dominated by byte-identical copies; running MinHash over them wastes
    * O(copies^2) candidate pairs inside every band bucket), then MinHash
    * LSH runs over unique representatives only.
    *
    * Returns (exactGroups, nearDupPairs): exactGroups maps every doc to
    * its representative (`keep_id`) with the group size; nearDupPairs are
    * near-duplicate pairs BETWEEN representatives. Full pair expansion is
    * a join of the two — rarely wanted at scale. */
  def nearDupPipeline(docs: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, numPerm: Int = 64, bands: Int = 16,
                      threshold: Double = 0.5): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    // One shuffle on fp does the whole exact-collapse: row_number picks the
    // min-id representative and count-over-partition carries the group size,
    // so there is no groupBy + join-back (which would shuffle the corpus
    // twice). The collapsed frame is eagerly localCheckpoint'ed because
    // BOTH outputs — the group stats and the MinHash stage (which reads
    // its input twice: signatures + exact-verify shingle sets) — derive
    // from it; unmaterialized, the fingerprint window pass over the full
    // corpus re-runs ~3× (downstream branches run CONCURRENTLY inside one
    // consumer query and race to recompute the subtree). Checkpoint, not
    // persist: blocks are MEMORY_AND_DISK either way (spills instead of
    // OOMing at 100 TB), but a checkpoint's blocks are released by the
    // ContextCleaner when the frame becomes unreferenced, so repeated
    // pipeline calls in a long-lived session don't leak cache entries.
    val byFp = Window.partitionBy(col("fp"))
    val reps = docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("fp", fingerprintMd5(col("text")))
      .withColumn("n_copies", count(lit(1)).over(byFp))
      .withColumn("rn", row_number().over(byFp.orderBy(col("id"))))
      .where(col("rn") === 1)
      .drop("rn")
      .transform(graft.ops.Pins.pin)
    val groups = reps.select(col("fp"), col("id").as("keep_id"), col("n_copies"))
    val pairs = minhashDedupPairs(reps.select(col("id"), col("text")), "id", "text",
      shingleN, numPerm, bands, threshold, repartitionInput = true)
    (groups, pairs)
  }

  // ------------------------------------------------------------- bm25 search

  /** BM25 ranked retrieval over the corpus for a fixed set of queries —
    * the lexical search a data-curation pipeline uses to pull topical
    * slices out of a 100 TB corpus (and the baseline every embedding
    * retriever is measured against).
    *
    * Scoring is the Lucene formulation:
    *   idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    *   s(q, d) = sum_t idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    *
    * Scale shape: the corpus is exploded to (doc, term) postings ONCE and
    * immediately semi-joined against the BROADCAST query-term set — the
    * only corpus-wide shuffle groups the few surviving postings, so the
    * cost tracks matches, not corpus size. Document frequencies are
    * per-query-term (a tiny aggregate), corpus stats one scalar row; both
    * broadcast back. Top-k is a per-query window over candidates only.
    *
    * Scores are rounded to 4 decimals BEFORE ranking (ties then break by
    * doc id) so rankings are reproducible across engines and runs. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: Seq[(String, String)], k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))
    val stats = base.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    // query terms normalized exactly like document tokens
    val qdf = queries
      .flatMap { case (qid, qt) =>
        qt.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).distinct
          .map(t => (qid, t))
      }
      .toDF("query_id", "term")
    val tf = base.select(col("id"), col("dl"), explode(col("toks")).as("term"))
      .join(broadcast(qdf.select("term").distinct()), Seq("term"), "left_semi")
      .groupBy(col("id"), col("term"), col("dl"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy("term")
      .agg(countDistinct(col("id")).cast("double").as("df"))
    val scored = tf
      .join(broadcast(qdf), Seq("term"))
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
          col("tf") * (k1 + 1) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("query_id"), col("id"))
      .agg(round(sum(col("contrib")), 4).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col("score"))
  }

  /** Top-k TF-IDF terms per document — the keyword extractor feeding
    * topical tagging / corpus browsing over a curated slice. Plain
    * log-idf formulation:
    *   tfidf(t, d) = tf(t, d) * ln(N / df(t))
    *
    * Scale shape: one explode + (doc, term) hash agg builds the postings
    * (map-side partial combine); document frequencies are a second agg
    * over the postings themselves (never re-touching the corpus); N is a
    * one-row broadcast. The df join shuffles on the term — vocabulary-
    * sized, orders of magnitude below corpus size — and the final top-k
    * is a per-doc window on the postings' own partitioning.
    *
    * Like [[bm25TopK]], scores round to 4 decimals BEFORE ranking (ties
    * then break alphabetically) so the selected term set is reproducible
    * across engines and runs. Corpus-wide terms (df = N) score 0, not
    * negative, and still rank by tf through the tiebreak chain. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("word"))
      .groupBy(col("id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val scored = tf
      .join(dfreq, Seq("word"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs") / col("df")), 4))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("tfidf").desc, col("word"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("id"), col("rank"), col("word"), col("tf"), col("tfidf"))
  }

  // ------------------------------------------------------------- language id

  /** Tiny per-language stopword markers for the n-gram/stopword heuristic.
    * Deterministic and broadcast as literals into the plan. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "que", "est", "pour"),
    "es" -> Seq("el", "la", "los", "de", "y", "un", "una", "que", "es", "para"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "ist", "zu", "den", "von"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1", "zhe4", "bu4"))

  /** Stopword-hit score for one language: fraction of tokens that are in
    * the language's stopword list. */
  def langScore(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isin(stopwords(lang).map(lit): _*))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")

  /** Predicted language: argmax of the per-language scores with a fixed
    * priority order (en, fr, es, de, zh) for ties; 'und' when no marker
    * hits at all. */
  def langId(toks: Column): Column = {
    val order = Seq("en", "fr", "es", "de", "zh")
    val scores = order.map(l => langScore(toks, l))
    val best = greatest(scores: _*)
    // foldRight nests later languages in the otherwise-branch, so the
    // first language in priority order wins ties
    order.zip(scores).foldRight(lit("und"): Column) {
      case ((l, s), acc) => when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  // ----------------------------------------------------------- quality score

  /** Heuristic quality features + composite score (length, punctuation
    * ratio, stopword ratio, mean word length). */
  def qualityFeatures(text: Column): Map[String, Column] = {
    val toks = tokens(text)
    val nChars = length(text).cast("double")
    val nPunct = (length(text) -
      length(regexp_replace(text, "[^\\w\\s]", ""))).cast("double")
    Map(
      "n_chars" -> nChars.cast("long"),
      "n_tokens" -> size(toks).cast("long"),
      "punct_ratio" -> round(nPunct / greatest(nChars, lit(1.0)), 4),
      "stopword_ratio" -> round(langScore(toks, "en"), 4),
      "mean_word_len" -> round(nChars / greatest(size(toks).cast("double"), lit(1.0)), 4))
  }

  /** Gopher quality rules (Rae et al., "Scaling Language Models: ...
    * Gopher", arXiv 2112.11446, Appendix A) — the named rule-based
    * document filter labs run before model-based scoring. Per document:
    * word count bounds, mean word length bounds, a symbol-to-word cap
    * (# and ellipses), a minimum fraction of words containing an
    * alphabetic character, and a minimum count of distinct required
    * stopwords ("the/be/to/of/and/that/have/with" — Gopher's list).
    * Output: the measured features (rounded, engine-comparable) plus
    * per-rule booleans and the overall `keep`. One projection over the
    * corpus scan — no shuffle, no UDF. */
  /** Unicode script ranges for [[scriptProfile]] — the blocks that cover
    * the bulk of web text; the `\x{...}` syntax is shared by Java regex
    * and RE2, so the SAME pattern strings drive Spark and the DuckDB
    * oracle. */
  val scriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "A-Za-z",
    "cjk" -> "\\x{4E00}-\\x{9FFF}",
    "cyrillic" -> "\\x{0400}-\\x{04FF}",
    "arabic" -> "\\x{0600}-\\x{06FF}",
    "devanagari" -> "\\x{0900}-\\x{097F}",
    "hangul" -> "\\x{AC00}-\\x{D7AF}")

  /** Script detection by Unicode block — the language-ID complement for
    * text where stopword lists fail (CJK has no spaces to tokenize,
    * Cyrillic/Arabic share no stopwords with the Latin lists). Per
    * document: the fraction of non-space characters in each major
    * script block, plus the dominant script ("other" when no block
    * reaches `minRatio` — symbol soup, digits, unsupported scripts).
    * One shuffle-free projection of codegen'd regexp counts. */
  def scriptProfile(docs: DataFrame, idCol: String, textCol: String,
                    minRatio: Double = 0.5): DataFrame = {
    val total = greatest(
      length(regexp_replace(col(textCol), "\\s", "")), lit(1)).cast("double")
    val ratios = scriptRanges.map { case (name, range) =>
      name -> round(
        length(regexp_replace(col(textCol), s"[^$range]", "")).cast("double") / total,
        4)
    }
    // argmax with deterministic ties (ratio desc, then script name asc)
    val ranked = array_sort(array(ratios.map { case (n, r) =>
      struct((-r).as("negr"), lit(n).as("script"))
    }: _*))
    val top = element_at(ranked, 1)
    docs.select(
      (col(idCol) +: ratios.map { case (n, r) => r.as(s"r_$n") }) :+
        when(-top.getField("negr") >= minRatio, top.getField("script"))
          .otherwise(lit("other")).as("dominant_script"): _*)
  }

  // (features, per-rule passes) shared by gopherQualityFlags/gopherKeep
  private def gopherParts(textCol: Column,
                          minWords: Int, maxWords: Int,
                          minMeanWordLen: Double, maxMeanWordLen: Double,
                          maxSymbolRatio: Double, minAlphaWordRatio: Double,
                          minStopwords: Int): (Seq[(String, Column)], Seq[Column]) = {
    val gopherStopwords = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val toks = tokens(textCol)
    val nWords = size(toks).cast("long")
    val meanLen = round(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        greatest(nWords, lit(1L)).cast("double"), 4)
    val nSymbols = size(filter(toks, t =>
      t.contains("#") || t.contains("...") || t.contains("…")))
    val symbolRatio = round(nSymbols.cast("double") /
      greatest(nWords, lit(1L)).cast("double"), 4)
    val alphaRatio = round(
      size(filter(toks, t => t.rlike("[a-z]"))).cast("double") /
        greatest(nWords, lit(1L)).cast("double"), 4)
    val nStop = size(array_intersect(array_distinct(toks),
      array(gopherStopwords.map(lit): _*))).cast("long")
    (Seq("n_words" -> nWords, "mean_word_len" -> meanLen,
        "symbol_ratio" -> symbolRatio, "alpha_ratio" -> alphaRatio,
        "n_stopwords" -> nStop),
      Seq(nWords >= minWords && nWords <= maxWords,
        meanLen >= minMeanWordLen && meanLen <= maxMeanWordLen,
        symbolRatio <= maxSymbolRatio,
        alphaRatio >= minAlphaWordRatio,
        nStop >= minStopwords))
  }

  def gopherQualityFlags(docs: DataFrame, idCol: String, textCol: String,
                         minWords: Int = 50, maxWords: Int = 100000,
                         minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                         maxSymbolRatio: Double = 0.1,
                         minAlphaWordRatio: Double = 0.8,
                         minStopwords: Int = 2): DataFrame = {
    val (features, passes) = gopherParts(col(textCol), minWords, maxWords,
      minMeanWordLen, maxMeanWordLen, maxSymbolRatio, minAlphaWordRatio,
      minStopwords)
    val passNames = Seq("pass_words", "pass_word_len", "pass_symbols",
      "pass_alpha", "pass_stopwords")
    docs.select(
      (col(idCol) +:
        features.map { case (n, c) => c.as(n) }) ++
        passNames.zip(passes).map { case (n, c) => c.as(n) } :+
        passes.reduce(_ && _).as("keep"): _*)
  }

  /** The Gopher keep predicate alone — the same five rules as
    * [[gopherQualityFlags]] folded into one boolean Column, for
    * composition into row-local filter prefixes (e.g.
    * [[CorpusPipeline]]'s single-pass audit aggregate). */
  def gopherKeep(text: Column,
                 minWords: Int = 50, maxWords: Int = 100000,
                 minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                 maxSymbolRatio: Double = 0.1,
                 minAlphaWordRatio: Double = 0.8,
                 minStopwords: Int = 2): Column =
    gopherParts(text, minWords, maxWords, minMeanWordLen, maxMeanWordLen,
      maxSymbolRatio, minAlphaWordRatio, minStopwords)._2.reduce(_ && _)

  /** (dup_frac, dup_char_frac) of an element array: occurrences BEYOND
    * the first count as duplicates (the find_duplicates convention of
    * Gopher reimplementations), so both stats fall out of the
    * all-vs-distinct difference — no sort, no map, two O(len) folds.
    * The element fraction divides by the element count; the char
    * fraction divides by `textLen` (the FULL document char length,
    * spaces and newlines included), matching the paper's and
    * DataTrove's normalization. */
  private def dupElementStats(arr: Column, textLen: Column): (Column, Column) = {
    val n = size(arr).cast("long")
    val nd = size(array_distinct(arr)).cast("long")
    val tot = aggregate(arr, lit(0L), (a, x) => a + length(x).cast("long"))
    val dtot = aggregate(array_distinct(arr), lit(0L),
      (a, x) => a + length(x).cast("long"))
    (round((n - nd).cast("double") / greatest(n, lit(1L)).cast("double"), 4),
      round((tot - dtot).cast("double") / textLen, 4))
  }

  /** Gopher REPETITION removal signals (Rae et al. arXiv:2112.11446
    * App. A.1.1) — the within-document counterpart of
    * [[gopherQualityFlags]]: templated/boilerplate pages repeat
    * themselves, and the repetition statistics catch what the
    * document-level rules miss. Per document:
    *
    *   - `dup_line_frac` / `dup_para_frac`: fraction of non-blank
    *     lines (split `\n`) / paragraphs (split `\n{2,}`) that are
    *     repeat occurrences of an earlier identical element;
    *   - `dup_line_char_frac` / `dup_para_char_frac`: the same mass
    *     measured in characters over the element char total;
    *   - `top_{2,3,4}gram_char_frac`: chars covered by the most
    *     repeated word n-gram (space-inclusive length x count, 0 when
    *     nothing repeats) over the FULL document char length — the
    *     paper/DataTrove normalization, so Table A1 thresholds apply
    *     as published;
    *   - `dup_{5..10}gram_char_frac`: chars in duplicated n-grams
    *     counted non-overlapping (DataTrove's find_all_duplicate
    *     skip-n scan — bounded by 1), same denominator;
    *   - `keep`: every statistic at or under its (Gopher Table A1
    *     default) threshold, compared on the rounded values so the
    *     decision is reproducible across engines.
    *
    * Known deviations from DataTrove, by choice: lines/paragraphs are
    * blank-filtered before counting (split("\n") of trailing newlines
    * would otherwise make every doc "contain duplicate lines"); null
    * text is treated as "" (well-defined zero stats, keep=true) rather
    * than propagating null into the keep flag and silently dropping
    * such rows under a WHERE; and the top-n-gram mass requires
    * count > 1 (DataTrove's find_top_duplicate scores the most frequent
    * n-gram even when it occurs once — we hold that a singleton is not
    * repetition, so a long unique document is not penalized for merely
    * containing its own longest n-gram). The guard is applied
    * consistently in the kernel, the DuckDB oracle, and the specs.
    *
    * Entirely row-local — a pure projection, no shuffle, no join: the
    * n-gram statistics are one [[graft.functions.NgramRepStats]] kernel
    * call per (doc, n), nothing crosses rows, so the operator scales
    * with corpus bytes like every other quality filter in this file. */
  def gopherRepetitionFlags(docs: DataFrame, idCol: String, textCol: String,
                            maxDupLineFrac: Double = 0.30,
                            maxDupParaFrac: Double = 0.30,
                            maxDupLineCharFrac: Double = 0.20,
                            maxDupParaCharFrac: Double = 0.20,
                            maxTopNgramCharFrac: Seq[(Int, Double)] =
                              Seq(2 -> 0.20, 3 -> 0.18, 4 -> 0.16),
                            maxDupNgramCharFrac: Seq[(Int, Double)] =
                              Seq(5 -> 0.15, 6 -> 0.14, 7 -> 0.13,
                                  8 -> 0.12, 9 -> 0.11, 10 -> 0.10)): DataFrame = {
    val all = gopherRepetitionParts(col(textCol), maxDupLineFrac,
      maxDupParaFrac, maxDupLineCharFrac, maxDupParaCharFrac,
      maxTopNgramCharFrac, maxDupNgramCharFrac)
    val keep = all.map { case (_, c, thr) => c <= thr }.reduce(_ && _)
    docs.select(col(idCol) +: all.map { case (nm, c, _) => c.as(nm) } :+
      keep.as("keep"): _*)
  }

  /** The Gopher repetition keep predicate alone — the same thirteen
    * statistics as [[gopherRepetitionFlags]] folded into one boolean
    * Column, for composition into row-local filter prefixes (the
    * repetition counterpart of [[gopherKeep]]; [[CorpusPipeline]] wires
    * it in behind `Thresholds.gopherRepetition`). */
  def gopherRepetitionKeep(text: Column,
                           maxDupLineFrac: Double = 0.30,
                           maxDupParaFrac: Double = 0.30,
                           maxDupLineCharFrac: Double = 0.20,
                           maxDupParaCharFrac: Double = 0.20,
                           maxTopNgramCharFrac: Seq[(Int, Double)] =
                             Seq(2 -> 0.20, 3 -> 0.18, 4 -> 0.16),
                           maxDupNgramCharFrac: Seq[(Int, Double)] =
                             Seq(5 -> 0.15, 6 -> 0.14, 7 -> 0.13,
                                 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)): Column =
    gopherRepetitionParts(text, maxDupLineFrac, maxDupParaFrac,
      maxDupLineCharFrac, maxDupParaCharFrac,
      maxTopNgramCharFrac, maxDupNgramCharFrac)
      .map { case (_, c, thr) => c <= thr }.reduce(_ && _)

  /** (name, rounded statistic, threshold) triples shared by
    * [[gopherRepetitionFlags]] and [[gopherRepetitionKeep]]. */
  private def gopherRepetitionParts(text0: Column,
      maxDupLineFrac: Double, maxDupParaFrac: Double,
      maxDupLineCharFrac: Double, maxDupParaCharFrac: Double,
      maxTopNgramCharFrac: Seq[(Int, Double)],
      maxDupNgramCharFrac: Seq[(Int, Double)]): Seq[(String, Column, Double)] = {
    val text = coalesce(text0, lit(""))
    val textLen = greatest(length(text).cast("long"), lit(1L)).cast("double")
    val nonBlank = (e: Column) => trim(e) =!= ""
    val (dupLine, dupLineChar) =
      dupElementStats(filter(split(text, "\n"), nonBlank), textLen)
    val (dupPara, dupParaChar) =
      dupElementStats(filter(split(text, "\n{2,}"), nonBlank), textLen)
    val toks = filter(tokens(text), t => t =!= "")
    val topCols = maxTopNgramCharFrac.map { case (n, thr) =>
      val st = graft.functions.TextExpressions.ngram_rep_stats(toks, n)
      (s"top_${n}gram_char_frac",
        round(element_at(st, 1).cast("double") / textLen, 4), thr)
    }
    val dupCols = maxDupNgramCharFrac.map { case (n, thr) =>
      val st = graft.functions.TextExpressions.ngram_rep_stats(toks, n)
      (s"dup_${n}gram_char_frac",
        round(element_at(st, 2).cast("double") / textLen, 4), thr)
    }
    Seq(
      ("dup_line_frac", dupLine, maxDupLineFrac),
      ("dup_line_char_frac", dupLineChar, maxDupLineCharFrac),
      ("dup_para_frac", dupPara, maxDupParaFrac),
      ("dup_para_char_frac", dupParaChar, maxDupParaCharFrac)) ++
      topCols ++ dupCols
  }

  /** Add-k-smoothed bigram language-model score per document, trained on
    * the corpus itself — the statistical analogue of a perplexity filter
    * (CCNet trains KenLM on a trusted corpus; without external models the
    * self-trained variant flags the same tail: documents whose token
    * transitions are improbable under the corpus distribution, i.e.
    * boilerplate soup, lorem-ipsum, and mojibake score low).
    *
    * P(w2|w1) = (C(w1 w2) + k) / (C(w1 .) + k * V), V = distinct
    * left-context vocabulary; every statistic derives from ONE exploded
    * bigram frame, localCheckpoint'd because four consumers share it
    * (bigram counts, context counts, the vocab scalar, and the scoring
    * join). The count tables are vocab-sized (Zipf), far smaller than
    * the corpus; the scoring joins shuffle on bigram/context keys whose
    * stopword skew is exactly what AQE skew-join splitting is for.
    * Returns (id, n_bigrams, avg_logprob) for docs with >= 2 tokens. */
  def bigramLogProbScores(docs: DataFrame, idCol: String, textCol: String,
                          k: Double = 0.5): DataFrame = {
    val lm = bigramLmTrain(docs, idCol, textCol)
    bigramLmScore(docs, idCol, textCol, lm, k)
  }

  /** A trained bigram LM: bigram counts, left-context counts, and the
    * left-context vocabulary size. Both frames are localCheckpoint'd —
    * vocab-sized (Zipf), reused by every scoring call, and a frozen
    * model must not recompute (or shift) when the training corpus frame
    * changes underneath it. */
  final case class BigramLm(bigramCounts: DataFrame, contextCounts: DataFrame,
                            vocabSize: Long)

  /** (id, w1, bg) bigram explode of docs with >= 2 tokens. */
  private def bigramPairs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"), tokens(col(textCol)).as("w"))
      .where(size(col("w")) >= 2)
      .select(col("id"), explode(arrays_zip(
        expr("slice(w, 1, size(w) - 1)"), expr("slice(w, 2, size(w) - 1)"))).as("p"))
      .select(col("id"), col("p.0").as("w1"),
        concat_ws(" ", col("p.0"), col("p.1")).as("bg"))

  /** Train the corpus bigram statistics once; score any number of
    * frames against the frozen model with [[bigramLmScore]] — the CCNet
    * discipline (train the LM on a trusted corpus, score candidates
    * against it) without the external model dependency. */
  def bigramLmTrain(corpus: DataFrame, idCol: String, textCol: String): BigramLm = {
    val pairs = bigramPairs(corpus, idCol, textCol).transform(graft.ops.Pins.pin)
    val bCounts = pairs.groupBy(col("bg")).agg(count(lit(1)).as("c_bg"))
      .transform(graft.ops.Pins.pin)
    val uCounts = pairs.groupBy(col("w1")).agg(count(lit(1)).as("c_w1"))
      .transform(graft.ops.Pins.pin)
    BigramLm(bCounts, uCounts, uCounts.count())
  }

  /** Score docs under a trained model: avg add-k log P(w2|w1) per doc.
    * Bigrams and contexts unseen in training fall back to the pure
    * smoothing mass (k / (k * V)) via the outer joins — the standard
    * open-vocabulary treatment. Returns (id, n_bigrams, avg_logprob)
    * for docs with >= 2 tokens. */
  def bigramLmScore(docs: DataFrame, idCol: String, textCol: String,
                    lm: BigramLm, k: Double = 0.5): DataFrame = {
    require(k > 0, s"bigramLmScore: smoothing k must be > 0, got $k")
    bigramPairs(docs, idCol, textCol)
      .join(lm.bigramCounts, Seq("bg"), "left")
      .join(lm.contextCounts, Seq("w1"), "left")
      .withColumn("c_bg", coalesce(col("c_bg"), lit(0L)))
      .withColumn("c_w1", coalesce(col("c_w1"), lit(0L)))
      .groupBy(col("id"))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        round(avg(log((col("c_bg") + k) / (col("c_w1") + k * lm.vocabSize))), 4)
          .as("avg_logprob"))
  }

  // -------------------------------------------------------- decontamination

  /** Benchmark decontamination flags: 1 for every document whose
    * whitespace-normalized text exactly matches a benchmark document —
    * the eval-set contamination sweep run before training. Matching is by
    * [[fingerprintMd5]]; the benchmark fingerprint set is the small side
    * (broadcast-able), documents stream through once. Near-dup-level
    * decontamination composes this with [[minhashDedupPairs]] across the
    * two corpora. */
  def contaminationFlags(docs: DataFrame, benchmark: DataFrame,
                         idCol: String, textCol: String,
                         benchTextCol: String): DataFrame = {
    val fps = docs.select(col(idCol).as("id"), fingerprintMd5(col(textCol)).as("fp"))
    val benchFps = benchmark
      .select(fingerprintMd5(col(benchTextCol)).as("fp")).distinct()
      .withColumn("__hit", lit(1))
    fps.join(benchFps, Seq("fp"), "left")
      .select(col("id"), col("__hit").isNotNull.cast("int").as("contaminated"))
  }

  /** The docs frame with benchmark-contaminated rows removed (a
    * broadcast-able left-anti join on the fingerprint). */
  def decontaminate(docs: DataFrame, benchmark: DataFrame,
                    textCol: String, benchTextCol: String): DataFrame =
    docs.join(
      benchmark.select(fingerprintMd5(col(benchTextCol)).as("__fp")).distinct(),
      fingerprintMd5(col(textCol)) === col("__fp"), "left_anti")

  /** [[decontaminate]] for a benchmark side too large to broadcast: the
    * benchmark fingerprints collapse into a Bloom filter probed at the
    * corpus scan (`ops.BloomJoin.antiJoin`), so rows the filter clears —
    * almost all of them — never reach a join, and only possible hits pay
    * the exact anti join. Results are identical to [[decontaminate]];
    * the one-sided filter error only routes rows, it never drops or
    * keeps one wrongly. */
  def decontaminateBloom(docs: DataFrame, benchmark: DataFrame,
                         textCol: String, benchTextCol: String,
                         expectedItems: Long = -1L, fpp: Double = 0.01): DataFrame = {
    val d = docs.withColumn("__fp", fingerprintMd5(col(textCol)))
    val b = benchmark.select(fingerprintMd5(col(benchTextCol)).as("__bfp")).distinct()
    graft.ops.BloomJoin.antiJoin(d, b, "__fp", "__bfp", expectedItems, fpp)
      .drop("__fp")
  }

  /** N-gram-overlap decontamination ids (the GPT-3 appendix-C scheme,
    * Brown et al. 2020: a training doc is contaminated if it shares ANY
    * word n-gram with any benchmark doc — canonically n=13; lower n for
    * short benchmarks). Returns the distinct contaminated doc ids;
    * compose with a left_anti to remove, or a flag join to audit.
    *
    * Scale: the benchmark's distinct n-gram set is small by assumption
    * and BROADCASTS; the corpus side streams through one scan — shingle
    * explode, broadcast LEFT SEMI, then a distinct bounded by the hit
    * count. No corpus-side wide shuffle at any size; this is strictly
    * cheaper than the MinHash cross path and catches partial-overlap
    * contamination (one shared passage) that whole-doc fingerprints and
    * document-level Jaccard both miss. */
  def ngramOverlapIds(docs: DataFrame, benchmark: DataFrame,
                      idCol: String, textCol: String, benchTextCol: String,
                      n: Int = 13): DataFrame = {
    require(n >= 1, s"ngramOverlapIds: n must be >= 1, got $n")
    val benchGrams = benchmark
      .select(explode(wordShingles(tokens(col(benchTextCol)), n)).as("__ng"))
      .distinct()
    docs
      .select(col(idCol), explode(wordShingles(tokens(col(textCol)), n)).as("__ng"))
      .join(broadcast(benchGrams), Seq("__ng"), "left_semi")
      .select(col(idCol))
      .distinct()
  }

  /** Repeated-passage detection: every position where a word n-gram
    * occurs verbatim in >= `minDocs` DISTINCT documents — the
    * Spark-shaped core of exact-substring dedup (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", ACL'22, which finds
    * repeated >= 50-token spans with a suffix array; fixed-length n-gram
    * matching finds every repeated span of length >= n at a fraction of
    * the machinery — adjacent flagged positions chain into the longer
    * span). Output: (id, pos, gram_md5) per flagged position, pos
    * 0-based in token space; callers clip or collapse the spans.
    *
    * Scale: one fused-shingle scan, one (gram, id)-distinct + count
    * shuffle — global by nature, exactly like the suffix-array sort it
    * replaces, but partitioned by gram hash with map-side combine. The
    * gram text never leaves the executors (md5 in place); the scan is
    * repeated for the position join rather than checkpointing the full
    * exploded corpus. */
  def repeatedPassages(docs: DataFrame, idCol: String, textCol: String,
                       n: Int = 20, minDocs: Int = 2): DataFrame = {
    require(n >= 1 && minDocs >= 2,
      s"repeatedPassages: need n >= 1, minDocs >= 2; got n=$n, minDocs=$minDocs")
    def grams(d: DataFrame): DataFrame = d.select(col(idCol).as("id"),
      posexplode(wordShingles(tokens(col(textCol)), n)).as(Seq("pos", "ng")))
    // two-stage distinct-count (distinct pairs, then count) — no Expand
    val hot = grams(docs).select(col("ng"), col("id")).distinct()
      .groupBy(col("ng")).agg(count(lit(1)).as("nd"))
      .where(col("nd") >= minDocs)
      .select(col("ng"))
    grams(docs).join(hot, Seq("ng"), "left_semi")
      .select(col("id"), col("pos").cast("long").as("pos"),
        md5(col("ng")).as("gram_md5"))
  }

  /** Collapse [[repeatedPassages]] positions into maximal repeated SPANS
    * per document: a run of consecutive flagged positions p..q means
    * tokens [p, q + n) repeat verbatim elsewhere — the (start_token,
    * end_token) clip list exact-substring dedup hands to the trimmer.
    * Classic gaps-and-islands: pos - row_number(pos) is constant within
    * a run; one per-doc window (parallel across docs), one group-by. */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                    n: Int = 20, minDocs: Int = 2): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos"))
    repeatedPassages(docs, idCol, textCol, n, minDocs)
      .withColumn("__island", col("pos") - row_number().over(w))
      .groupBy(col("id"), col("__island"))
      .agg(min(col("pos")).as("start_token"),
        (max(col("pos")) + n).as("end_token"),
        count(lit(1)).cast("long").as("n_grams"))
      .drop("__island")
  }

  /** Apply exact-substring dedup: clip every repeated n-gram occurrence
    * EXCEPT the one in the gram's minimum-id document, so exactly one
    * copy of each repeated passage survives corpus-wide (Lee et al.
    * ACL'22 keep-one discipline, with min-id as the deterministic
    * canonical choice — the same representative rule the cluster dedup
    * uses). Returns (id, text) with text in normalized token form —
    * clipped docs lose the covered tokens, untouched docs pass through
    * normalized, so the output space is uniform.
    *
    * The clip rebuild is a per-token filter against the doc's (usually
    * tiny) clip-position list; docs with no clips skip it entirely via
    * the left join. Same scan/shuffle shape as [[repeatedPassages]] plus
    * one broadcast-sized join of the clip lists. */
  def clipRepeated(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 20, minDocs: Int = 2): DataFrame = {
    require(n >= 1 && minDocs >= 2,
      s"clipRepeated: need n >= 1, minDocs >= 2; got n=$n, minDocs=$minDocs")
    def grams(d: DataFrame): DataFrame = d.select(col(idCol).as("id"),
      posexplode(wordShingles(tokens(col(textCol)), n)).as(Seq("pos", "ng")))
    val hot = grams(docs).select(col("ng"), col("id")).distinct()
      .groupBy(col("ng"))
      .agg(count(lit(1)).as("nd"), min(col("id")).as("__min_id"))
      .where(col("nd") >= minDocs)
      .select(col("ng"), col("__min_id"))
    val clips = grams(docs).join(hot, Seq("ng"))
      .where(col("id") =!= col("__min_id"))
      .groupBy(col("id"))
      .agg(sort_array(collect_set(col("pos").cast("long"))).as("__clips"))
    docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .join(clips, Seq("id"), "left")
      .withColumn("__c", coalesce(col("__clips"), array().cast("array<long>")))
      .withColumn("text", expr(
        s"""array_join(filter(split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' '),
              (t, i) -> !exists(__c, p -> i >= p AND i < p + $n)), ' ')"""))
      .select(col("id").as(idCol), col("text"))
  }

  /** Per-benchmark-document contamination report: for each benchmark
    * doc, how many distinct corpus docs share at least one word n-gram
    * with it — the attribution view of [[ngramOverlapIds]] (which only
    * says "this corpus doc is dirty"; an eval owner needs to know WHICH
    * benchmark items are compromised and how widely). Benchmark docs
    * with zero hits are included at 0: those are the items whose eval
    * numbers remain trustworthy.
    *
    * Same scale shape as [[ngramOverlapIds]]: the benchmark n-gram set
    * broadcasts, the corpus streams through one scan; the aggregation
    * key space is (bench doc x corpus doc) pairs that actually collide
    * — bounded by real contamination, not corpus size. */
  def contaminationReport(docs: DataFrame, benchmark: DataFrame,
                          idCol: String, textCol: String,
                          benchIdCol: String, benchTextCol: String,
                          n: Int = 13): DataFrame = {
    require(n >= 1, s"contaminationReport: n must be >= 1, got $n")
    val benchGrams = benchmark
      .select(col(benchIdCol).as("bench_id"),
        explode(wordShingles(tokens(col(benchTextCol)), n)).as("__ng"))
      .distinct()
    val hits = docs
      .select(col(idCol).as("__doc_id"),
        explode(wordShingles(tokens(col(textCol)), n)).as("__ng"))
      .join(broadcast(benchGrams), Seq("__ng"))
      .select(col("bench_id"), col("__doc_id")).distinct()
      .groupBy(col("bench_id"))
      .agg(count(lit(1)).as("n_contaminating_docs"))
    benchmark.select(col(benchIdCol).as("bench_id")).distinct()
      .join(hits, Seq("bench_id"), "left")
      .select(col("bench_id"),
        coalesce(col("n_contaminating_docs"), lit(0L)).as("n_contaminating_docs"))
  }

  /** Remove n-gram-contaminated docs: [[ngramOverlapIds]] + anti join. */
  def decontaminateNgramOverlap(docs: DataFrame, benchmark: DataFrame,
                                idCol: String, textCol: String,
                                benchTextCol: String, n: Int = 13): DataFrame = {
    val hits = ngramOverlapIds(docs, benchmark, idCol, textCol, benchTextCol, n)
      .withColumnRenamed(idCol, "__hit_id")
    docs.join(broadcast(hits), col(idCol) === col("__hit_id"), "left_anti")
  }

  /** Incremental corpus dedup — the daily-batch shape: collapse exact
    * dups WITHIN the new batch (min-id representative), then drop
    * everything already represented in the existing corpus, exactly
    * (fingerprint anti-join against the corpus fingerprint set) and
    * nearly ([[minhashCrossDupPairs]] with the big corpus as the
    * streaming left side and the small batch broadcast).
    *
    * Scale: the existing corpus is scanned, never shuffled (the batch's
    * banded signatures broadcast); the fingerprint set for the exact
    * stage is one md5 per corpus doc — at the 100 TB tier that set is
    * itself big, so it rides a shuffled anti-join automatically once it
    * exceeds the broadcast threshold, which is the right plan either
    * way. Near-dups WITHIN the batch are intentionally out of scope —
    * batches get the full [[CorpusPipeline.preprocess]] treatment; this
    * operator answers only "is it new relative to the corpus".
    *
    * THIS FORM IS THE VALIDATION / ONE-OFF SHAPE: it re-fingerprints
    * and re-signs the whole corpus on every call, so per-batch CPU is
    * O(corpus) — fine for a single ad-hoc compare, a scale-killer for a
    * RECURRING daily/streaming batch. The production form is the
    * indexed overload below (backed by [[DedupIndex]]), whose per-batch
    * cost is bounded by the batch and its candidate matches and stays
    * flat as the corpus grows. The two forms return identical survivor
    * sets (DedupIndexSpec proves the equivalence). */
  def dedupIncremental(newDocs: DataFrame, existing: DataFrame,
                       idCol: String, textCol: String,
                       shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(fingerprintMd5(col(textCol))).orderBy(col(idCol))
    val batch = newDocs
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
    // exactNew feeds three consumers and re-plans its (cheap, batch-
    // sized) window+anti subtree per consumer — measured: pinning it
    // here LOST ~0.3 s (the eager materialization barrier and the
    // checkpoint's stats loss cost more than the recompute it saves),
    // so it deliberately stays lazy
    val exactNew = batch.join(
      existing.select(fingerprintMd5(col(textCol)).as("__fp")).distinct(),
      fingerprintMd5(col(textCol)) === col("__fp"), "left_anti")
    val nearHits = minhashCrossDupPairs(
        existing.select(col(idCol), col(textCol)),
        exactNew.select(col(idCol), col(textCol)),
        idCol = idCol, textCol = textCol,
        shingleN = shingleN, threshold = threshold)
      .select(col("id_r").as("__hit_id")).distinct()
    exactNew.join(nearHits, col(idCol) === col("__hit_id"), "left_anti")
  }

  /** Incremental corpus dedup, INDEXED — the recurring-batch production
    * form: probe the batch against a persisted [[DedupIndex]] (built
    * once from the corpus via [[DedupIndex.buildFrom]] or maintained by
    * [[DedupIndex.ingestBatch]]) instead of re-signing the accumulated
    * corpus. Per-batch cost: one pruned scan of the 3-column band table
    * vs the broadcast batch + candidate-bounded signature/text fetches —
    * flat as the corpus grows. Pure (no index/corpus writes); returns
    * the same survivor set as the scan form above under the same
    * MinHash parameters. */
  def dedupIncremental(newDocs: DataFrame, existing: DataFrame,
                       idCol: String, textCol: String,
                       indexDir: String,
                       params: DedupIndex.Params): DataFrame =
    DedupIndex.probeBatch(newDocs, existing, indexDir, idCol, textCol, params)

  // ------------------------------------------------------------ split guard

  /** Train/test split-leakage guard: near-duplicate pairs that straddle
    * the split boundary — the contamination a dedup-aware splitter must
    * eliminate before eval numbers mean anything. `pairs` comes from any
    * of the near-dup detectors; `assignments` maps id -> split label.
    * Two broadcast-able joins; the pair list is the small side by
    * construction. */
  def splitLeakage(pairs: DataFrame, assignments: DataFrame,
                   idCol: String, splitCol: String): DataFrame =
    pairs
      .join(assignments.select(col(idCol).as("id_a"), col(splitCol).as("split_a")), "id_a")
      .join(assignments.select(col(idCol).as("id_b"), col(splitCol).as("split_b")), "id_b")
      .where(col("split_a") =!= col("split_b"))

  // ------------------------------------------------------------- redaction

  /** RE2-compatible patterns (no backrefs/lookaround) so the engine and
    * any SQL oracle agree character-for-character. */
  val urlPattern = "https?://[^\\s]+"
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
  val phonePattern = "\\+?\\d[\\d()\\-\\s]{6,}\\d"

  /** Scrub PII-ish spans with typed placeholders — the pre-training
    * redaction step. URLs first (a URL may embed an @-credential and must
    * win as a whole), then bare emails. Pure codegen'd regexp_replace. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(text, urlPattern, "<URL>"),
      emailPattern, "<EMAIL>")

  /** The full default rule chain for [[redactAll]]. Order is load-
    * bearing: URLs swallow embedded credentials and IP-shaped hosts
    * before the narrower rules see them; IPs go before phones so a
    * dotted quad is never half-eaten as a digit run. */
  val defaultRedactRules: Seq[(String, String)] = Seq(
    urlPattern -> "<URL>",
    emailPattern -> "<EMAIL>",
    ipv4Pattern -> "<IP>",
    phonePattern -> "<PHONE>")

  /** Deterministic PSEUDONYMIZATION: every match of `pattern` becomes
    * `<label:xxxxxxxx>` where the tag is the md5 prefix of the matched
    * text — so the same entity gets the SAME tag across every document
    * and every run. That linkage is what plain [[redact]] destroys:
    * after redaction "how many docs mention this address" is
    * unanswerable; after pseudonymization it is a group-by.
    *
    * Row-local: extract the row's distinct matches, fold them over the
    * text longest-first (a match embedded in a longer match must not be
    * replaced first — `bob@x.com` inside `abob@x.com`), each fold step
    * a replace-all. Matches per row are bounded by the row; nothing
    * shuffles. The md5 prefix is 32 bits — collision-safe for entity
    * counting, NOT a cryptographic anonymization (a dictionary attack
    * on emails is trivial; treat tags as pseudonyms, not secrets). */
  def pseudonymize(text: Column, pattern: String, label: String): Column = {
    val ms = array_distinct(regexp_extract_all(text, lit(pattern), lit(0)))
    val longestFirst = transform(
      sort_array(transform(ms, m => struct((-length(m)).as("a"), m.as("b")))),
      s => s.getField("b"))
    // the tag is 'h' + 7 md5 hex chars, NOT 8: an 8-hex prefix can be
    // all digits (~2.3% of tags), and a digit run of 8 inside an
    // earlier rule's tag would re-match the PHONE pattern on the next
    // pseudonymizeAll pass, corrupting the tag. 'h' breaks the run and
    // caps the digit tail at 7 — below every numeric rule's minimum.
    aggregate(longestFirst, text, (acc, m) =>
      call_function("replace", acc, m,
        concat(lit(s"<$label:h"), substring(md5(m), 1, 7), lit(">"))))
  }

  /** [[pseudonymize]] under the [[defaultRedactRules]] pattern set
    * (url, email, ipv4, phone — same order, urls swallow embedded
    * credentials first). */
  def pseudonymizeAll(text: Column,
                      rules: Seq[(String, String)] = Seq(
                        urlPattern -> "URL", emailPattern -> "EMAIL",
                        ipv4Pattern -> "IP", phonePattern -> "PHONE")): Column =
    rules.foldLeft(text) { case (acc, (pat, label)) =>
      pseudonymize(acc, pat, label)
    }

  /** Configurable multi-rule redaction: apply `(pattern, placeholder)`
    * rules in order, each a replace-all. Still one codegen'd projection
    * — the rule chain folds into nested regexp_replace calls, so a
    * 4-rule scrub over 100 TB is a single pass over the scan with zero
    * shuffles, exactly like [[redact]]. Patterns must stay RE2-safe for
    * engine/oracle agreement (the defaults are). */
  def redactAll(text: Column,
                rules: Seq[(String, String)] = defaultRedactRules): Column = {
    require(rules.nonEmpty, "redactAll: empty rule list")
    rules.foldLeft(text) { case (c, (pat, ph)) => regexp_replace(c, pat, ph) }
  }

  /** Token repetition ratio: 1 - distinct/total — high values flag the
    * degenerate repeated-boilerplate documents a quality filter drops. */
  def repetitionRatio(toks: Column): Column =
    round(lit(1.0) - size(array_distinct(toks)).cast("double") /
      greatest(size(toks), lit(1)).cast("double"), 4)

  // ----------------------------------------------------------- fingerprints

  /** Content fingerprint of whitespace-normalized text (md5 — stable
    * across engines for the exact-dedup path). */
  def fingerprintMd5(text: Column): Column = md5(normalizeText(text))
}
