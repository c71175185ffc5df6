package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-statistics audits: the Zipf rank-frequency fit (natural
  * corpora follow log(freq) ~ -s*log(rank) with s near 1 — template
  * spam, boilerplate floods, and synthetic collapse bend the line) and
  * per-document n-gram novelty (the share of a doc's n-grams that
  * appear in NO other document — the memorization/duplication audit at
  * the gram level).
  *
  * Shapes: Zipf is a vocabulary-keyed count, a top-k
  * (TakeOrderedAndProject — never a global sort), and a least-squares
  * reduce over k points. Novelty is one (doc, gram) explode, one
  * gram-keyed count, one join back and a doc-keyed reduce — the
  * repeated-passages family's linear shape. */
object CorpusStats {

  /** One-row Zipf fit over the whole frame: vocabulary size, total
    * tokens, and the least-squares slope / intercept / r2 of
    * ln(count) vs ln(rank) over the `topK` most frequent words
    * (rank ties broken by word — deterministic). A healthy natural
    * corpus fits slope ~ -1 with high r2. */
  def zipfFit(df: DataFrame, textCol: String, topK: Int = 100): DataFrame = {
    val wc = df.select(explode(TextOps.tokens(col(textCol))).as("__w"))
      .where(col("__w") =!= "")
      .groupBy(col("__w")).agg(count(lit(1)).as("__n"))
    val totals = wc.agg(
      count(lit(1)).cast("long").as("vocab_size"),
      sum(col("__n")).cast("long").as("total_tokens"))
    // top-k FIRST (scale-safe), then rank the tiny frame
    val top = wc.orderBy(col("__n").desc, col("__w")).limit(topK)
      .withColumn("__rank", row_number().over(
        Window.orderBy(col("__n").desc, col("__w"))))
    val fit = top
      .select(log(col("__rank").cast("double")).as("__x"),
              log(col("__n").cast("double")).as("__y"))
      .agg(count(lit(1)).cast("long").as("top_k"),
        expr("regr_slope(__y, __x)").as("__s"),
        expr("regr_intercept(__y, __x)").as("__i"),
        expr("regr_r2(__y, __x)").as("__r"))
    totals.crossJoin(broadcast(fit)).select(
      col("vocab_size"), col("total_tokens"), col("top_k"),
      (round(col("__s"), 6) + lit(0.0)).as("slope"),
      (round(col("__i"), 6) + lit(0.0)).as("intercept"),
      (round(col("__r"), 6) + lit(0.0)).as("r2"))
  }

  /** Top-k collocations by pointwise mutual information:
    * PMI(a,b) = ln( p(ab) / (p(a) p(b)) ) over adjacent word bigrams
    * with at least `minCount` occurrences — the multiword-expression /
    * boilerplate-phrase detector. Ordered by (rounded PMI desc,
    * bigram) so the top-k cut is deterministic cross-engine.
    *
    * Shape: two vocabulary-keyed counts (unigrams, bigrams; map-side
    * combined), two vocab-sized joins to attach the component counts,
    * two broadcast scalars for the totals, then TakeOrderedAndProject
    * for the cut. */
  def collocations(df: DataFrame, textCol: String, minCount: Long = 5,
                   topK: Int = 20): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val uni = df.select(explode(toks).as("__w"))
      .where(col("__w") =!= "")
      .groupBy(col("__w")).agg(count(lit(1)).cast("double").as("__cw"))
    val n1 = uni.agg(sum(col("__cw")).as("__n1"))
    val bi = df.select(explode(TextOps.wordShingles(toks, 2)).as("__b"))
      .groupBy(col("__b")).agg(count(lit(1)).cast("double").as("__cb"))
    val n2 = bi.agg(sum(col("__cb")).as("__n2"))
    val parts = bi.where(col("__cb") >= minCount)
      .withColumn("__wa", element_at(split(col("__b"), " "), 1))
      .withColumn("__wb", element_at(split(col("__b"), " "), 2))
      .join(uni.select(col("__w").as("__wa"), col("__cw").as("__ca")), "__wa")
      .join(uni.select(col("__w").as("__wb"), col("__cw").as("__cbw")), "__wb")
      .crossJoin(broadcast(n1)).crossJoin(broadcast(n2))
    val pmi = (round(log((col("__cb") / col("__n2")) /
      ((col("__ca") / col("__n1")) * (col("__cbw") / col("__n1")))), 6)
      + lit(0.0))
    parts.select(col("__b").as("bigram"),
        col("__cb").cast("long").as("n"), pmi.as("pmi"))
      .orderBy(col("pmi").desc, col("bigram")).limit(topK)
  }

  /** Per-document n-gram novelty: of the doc's DISTINCT word n-grams,
    * the share appearing in no other document. Docs shorter than `n`
    * tokens have no grams and no row (mirrored by the oracle). High
    * novelty = genuinely new text; low = assembled from corpus-common
    * phrasing (or a duplicate the exact/near-dup passes should have
    * caught). */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3): DataFrame = {
    val grams = df.select(col(idCol), explode(array_distinct(
        TextOps.wordShingles(TextOps.tokens(col(textCol)), n))).as("__g"))
    val counts = grams.groupBy(col("__g"))
      .agg(count(lit(1)).as("__dc")) // grams are per-doc distinct
    grams.join(counts, "__g")
      .groupBy(col(idCol)).agg(
        count(lit(1)).cast("long").as("n_grams"),
        sum(when(col("__dc") === 1, 1L).otherwise(0L)).as("n_novel"),
        round(sum(when(col("__dc") === 1, 1.0).otherwise(0.0)) /
          count(lit(1)), 4).as("novelty"))
  }
}
