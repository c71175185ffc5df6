package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenization (Kudo 2018, the SentencePiece default):
  * segment each word into the vocabulary pieces maximizing the SUM of
  * piece log-probabilities — a Viterbi DP over character positions,
  * unlike [[Wordpiece]]'s greedy longest-match (which can be globally
  * suboptimal) and [[Bpe]]'s bottom-up merges. Completes the tokenizer
  * trio a training-data pipeline needs.
  *
  * The model here is the DETERMINISTIC empirical variant: vocabulary =
  * top-N whole words + the character alphabet, scored by corpus
  * frequency (`ln(count/total)`). Real SentencePiece refines piece
  * probabilities by EM; the segmentation machinery — the part that
  * runs at corpus scale — is identical, and keeping the scores
  * closed-form is what lets a SQL oracle replay the exact DP.
  *
  * Execution shape: training is two bounded aggregations collected
  * driver-side (the model discipline); encoding is a ROW-LOCAL
  * `aggregate` fold over `sequence(1, len(word))` carrying the DP
  * table `best[0..j]` as an array of (score, pieces) structs — each
  * step appends the argmax over vocabulary pieces ending at position
  * j. The fold runs once per DISTINCT word (Zipf-bounded), instances
  * then join the encoded vocabulary back on the word key: higher-order
  * functions are CodegenFallback (every lambda step is interpreted,
  * with per-step array allocation), so the per-instance form measured
  * 92.9 s at sf0.1 where the dedup-join form runs in ~2 s — the
  * distinct+join shuffles are vocabulary-sized and trivially cheaper
  * than re-running the DP per instance. Hash-gated against a DuckDB
  * recursive CTE running the identical DP (same distinct-word dedup). */
object Unigram {

  /** piece -> ln(count/total); whole-word pieces keep their word
    * count, characters their occurrence count. */
  final case class Model(pieces: Seq[(String, Double)])

  /** Deterministic empirical model: `topWords` most frequent words
    * (ties by word) plus every character of the corpus alphabet
    * (counted over all word instances), normalized into one
    * distribution. */
  def train(docs: DataFrame, textCol: String, topWords: Int = 30): Model = {
    val words = docs.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .transform(graft.ops.Pins.pin) // two bounded aggs ride one corpus pass
    val top = words.groupBy(col("word")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word"))
      .limit(topWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val topSet = top.map(_._1).toSet
    val chars = words
      .select(explode(split(col("word"), "")).as("ch"))
      .where(length(col("ch")) === 1)
      .groupBy(col("ch")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .filterNot { case (ch, _) => topSet(ch) }
      .sortBy(_._1)
    val vocab = top ++ chars
    val total = vocab.map(_._2).sum.toDouble
    Model(vocab.map { case (p, c) => (p, math.log(c / total)) })
  }

  /** Viterbi encode: one row per (doc, word index, piece index).
    * A word with an uncovered position (impossible when encoding the
    * training corpus — the alphabet is in the vocab) emits a single
    * `[UNK]`, the [[Wordpiece]] convention. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             model: Model): DataFrame = {
    require(model.pieces.nonEmpty, "unigram: empty model")
    val vocabLit = typedlit(model.pieces)
    val words = docs
      .select(col(idCol), posexplode(TextOps.tokens(col(textCol)))
        .as(Seq("wi", "word")))
      .select(col(idCol), (col("wi") + 1).cast("long").as("widx"), col("word"))
    val cellType = "struct<score:double,pieces:array<string>>"
    // best(j+1) = optimal (score, pieces) for the length-j prefix
    val dp = aggregate(
      sequence(lit(1), length(col("word"))),
      expr(s"CAST(array(struct(0.0D, array())) AS array<$cellType>)"),
      (acc: Column, j: Column) => {
        val cands = filter(vocabLit, p =>
          length(p("_1")) <= j &&
            col("word").substr(j - length(p("_1")) + lit(1),
              length(p("_1"))) === p("_1"))
        val scored = transform(cands, p => {
          val prev = element_at(acc, j - length(p("_1")) + lit(1))
          struct(
            (prev("score") + p("_2")).as("score"),
            concat(prev("pieces"), array(p("_1"))).as("pieces"),
            length(p("_1")).as("plen"),
            p("_1").as("piece"))
        })
        // argmax by (score desc, piece length desc, piece asc) — the
        // oracle's exact tie-break order
        val best = element_at(array_sort(scored, (l, r) =>
          when(l("score") > r("score"), lit(-1))
            .when(l("score") < r("score"), lit(1))
            .when(l("plen") > r("plen"), lit(-1))
            .when(l("plen") < r("plen"), lit(1))
            .when(l("piece") < r("piece"), lit(-1))
            .otherwise(lit(1))), 1)
        // a position no piece ends at gets a -inf sentinel so the DP
        // table stays index-aligned; -inf poisons every path through it
        when(size(scored) === 0, concat(acc, array(
          expr(s"CAST(struct(double('-Infinity'), array()) AS $cellType)"))))
          .otherwise(concat(acc, array(
            struct(best("score").as("score"), best("pieces").as("pieces")))))
      })
    val fin = element_at(dp, length(col("word")) + 1)
    val pieces = when(fin("score") === lit(Double.NegativeInfinity),
      array(lit("[UNK]"))).otherwise(fin("pieces"))
    // STREAMS keep the row-local per-instance fold (distinct/checkpoint
    // are illegal on unbounded input, and micro-batches are small);
    // batch runs dedup to one fold per distinct word
    if (docs.isStreaming)
      return words.select(col(idCol), col("widx"),
          posexplode(pieces).as(Seq("pi", "piece")))
        .select(col(idCol), col("widx"),
          (col("pi") + 1).cast("long").as("pidx"), col("piece"))
    val encoded = words.select(col("word")).distinct()
      .select(col("word"), pieces.as("__pieces"))
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
}
