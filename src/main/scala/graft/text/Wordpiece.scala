package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenization (Wu et al. 2016, the BERT-family tokenizer):
  * each word is greedily split into the LONGEST vocabulary piece at
  * each position, continuation pieces carrying the `##` prefix; a word
  * with no match at some position becomes a single `[UNK]`.
  * Complements [[Bpe]] — BPE merges pairs bottom-up from a learned
  * merge list, WordPiece matches top-down against a vocabulary, and
  * real pipelines need both families.
  *
  * Execution shape: vocabulary construction is two bounded
  * aggregations (word frequencies for the whole-word pieces; the
  * distinct character alphabet), collected driver-side — the vocab is
  * a model, not data, same discipline as
  * [[graft.vec.VectorOps.pqTrain]]. Encoding is a ROW-LOCAL
  * `aggregate` fold: the greedy scan advances at least one character
  * per step, so folding over `sequence(1, length(word))` always
  * terminates with the pieces exact — no UDF, no driver loop, no
  * shuffle (the word explode is per-doc projection). Hash-gated
  * against a DuckDB oracle running the identical greedy recurrence as
  * a recursive CTE (the `chunkSentences` discipline). */
object Wordpiece {

  /** The trained vocabulary: initial pieces (whole-word + single
    * characters) and continuation pieces (single characters). Real
    * deployments load a vocab file; [[buildVocab]] derives a
    * deterministic one from the corpus. */
  final case class Vocab(initials: Seq[String], continuations: Seq[String])

  /** Deterministic corpus vocabulary: the `topWords` most frequent
    * words as whole pieces (ties by word) plus the full character
    * alphabet in both initial and continuation form — so encoding the
    * training corpus never emits `[UNK]`. */
  def buildVocab(docs: DataFrame, textCol: String,
                 topWords: Int = 30): Vocab = {
    val words = docs.select(explode(TextOps.tokens(col(textCol))).as("word"))
    val top = words.groupBy(col("word")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word"))
      .limit(topWords)
      .collect().map(_.getString(0)).toSeq
    val chars = words.distinct()
      .select(explode(split(col("word"), "")).as("ch"))
      .where(length(col("ch")) === 1)
      .distinct().collect().map(_.getString(0)).toSeq.sorted
    Vocab((top ++ chars).distinct, chars)
  }

  /** Greedy longest-match encode: one output row per (doc, word index,
    * piece index). `[UNK]` words emit exactly one row. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             vocab: Vocab): DataFrame = {
    require(vocab.initials.nonEmpty, "wordpiece: empty vocabulary")
    val initArr = typedlit(vocab.initials)
    val contArr = typedlit(vocab.continuations)
    val words = docs
      .select(col(idCol), posexplode(TextOps.tokens(col(textCol)))
        .as(Seq("wi", "word")))
      .select(col(idCol), (col("wi") + 1).cast("long").as("widx"), col("word"))
    val stateType = "struct<pos:int,pieces:array<string>,dead:boolean>"
    val folded = aggregate(
      sequence(lit(1), length(col("word"))),
      expr(s"CAST(struct(1, array(), false) AS $stateType)"),
      (acc: Column, _: Column) => {
        val pos = acc("pos"); val pieces = acc("pieces"); val dead = acc("dead")
        val cands = when(pos === 1, initArr).otherwise(contArr)
        val matched = filter(cands,
          p => col("word").substr(pos, length(p)) === p)
        // longest match wins; equal-length matches are identical strings,
        // the lexicographic tiebreak only canonicalizes the sort
        val best = element_at(array_sort(matched, (l, r) =>
          when(length(l) > length(r), lit(-1))
            .when(length(l) < length(r), lit(1))
            .when(l < r, lit(-1)).otherwise(lit(1))), 1)
        when(dead || pos > length(col("word")), acc)
          .when(size(matched) === 0, struct(pos.as("pos"),
            array(lit("[UNK]")).as("pieces"), lit(true).as("dead")))
          .otherwise(struct(
            (pos + length(best)).cast("int").as("pos"),
            concat(pieces, array(
              when(pos === 1, best)
                .otherwise(concat(lit("##"), best)))).as("pieces"),
            lit(false).as("dead")))
      })
    // the greedy fold is interpreted (HOFs are CodegenFallback): run it
    // once per DISTINCT word and join instances back on the word key —
    // the Unigram.encode measurement (92.9 s per-instance vs ~2 s
    // deduped at sf0.1) applies identically here
    // STREAMS keep the row-local per-instance fold (distinct/checkpoint
    // are illegal on unbounded input, and micro-batches are small);
    // batch runs dedup to one fold per distinct word
    if (docs.isStreaming)
      return words.select(col(idCol), col("widx"),
          posexplode(folded("pieces")).as(Seq("pi", "piece")))
        .select(col(idCol), col("widx"),
          (col("pi") + 1).cast("long").as("pidx"), col("piece"))
    val encoded = words.select(col("word")).distinct()
      .select(col("word"), folded("pieces").as("__pieces"))
      // localCheckpoint = optimizer barrier, not just a cache: the
      // posexplode downstream makes InferFiltersFromGenerate add a
      // size(__pieces) > 0 filter, and predicate pushdown SUBSTITUTES
      // THE WHOLE DP EXPRESSION for __pieces and pushes it below the
      // distinct — re-evaluating the fold per word INSTANCE (measured:
      // the full 85 s again). Materializing the vocab-sized frame pins
      // the fold to one evaluation per distinct word.
      .transform(graft.ops.Pins.pin)
    words.join(encoded, Seq("word"))
      .select(col(idCol), col("widx"),
        posexplode(col("__pieces")).as(Seq("pi", "piece")))
      .select(col(idCol), col("widx"),
        (col("pi") + 1).cast("long").as("pidx"), col("piece"))
  }

  /** Tokenizer fertility report: pieces-per-word per `groupCols` value
    * (per language, per source, ...) — the eval that picks a tokenizer
    * BEFORE committing a 100 TB encode (fertility ~1 means the vocab
    * fits the language; >> 1 means it fragments into characters).
    * Tokenizer-agnostic: `pieces` is any (idCol, ..., piece-row) frame
    * — [[encode]] output, [[Unigram.encode]] output, or BPE rows.
    *
    * Shape: per-doc piece counts aggregate FIRST (id-keyed, map-side
    * combined), so only (id, count) rows meet the documents join —
    * piece strings never cross a shuffle; the final agg is
    * group-domain-sized. */
  def fertility(pieces: DataFrame, docs: DataFrame, idCol: String,
                textCol: String, groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "fertility: need at least one group column")
    val np = pieces.groupBy(col(idCol)).agg(count(lit(1)).as("__np"))
    val nw = docs.select(groupCols.map(col) :+ col(idCol) :+
      size(TextOps.tokens(col(textCol))).cast("long").as("__nw"): _*)
    nw.join(np, Seq(idCol), "left")
      .na.fill(0L, Seq("__np"))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__nw")).as("n_words"), sum(col("__np")).as("n_pieces"),
        (round(sum(col("__np")).cast("double") / sum(col("__nw")), 6)
          + lit(0.0)).as("fertility"))
  }
}
