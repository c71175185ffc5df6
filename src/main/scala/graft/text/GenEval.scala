package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextExpressions

/** Generation-eval metrics at corpus scale — BLEU (Papineni et al.
  * ACL 2002), ROUGE-N and ROUGE-L (Lin 2004): the model-output side of
  * the eval tier, next to [[Eval]]'s selector metrics and the ranked-
  * retrieval metrics. A 100 TB pipeline scores millions of generated
  * (candidate, reference) pairs per eval sweep; every kernel here is
  * row-local (clipped n-gram matches and LCS as native codegen
  * expressions — [[graft.functions.ClippedNgramMatches]],
  * [[graft.functions.LcsLength]] — one tight loop per row, no UDF, no
  * shuffle), so per-pair scoring is embarrassingly parallel and the
  * corpus-BLEU reduction is ONE partial-aggregated global sum.
  *
  * Tokenization is [[TextOps.tokens]] (lowercase, whitespace) for
  * engine-wide consistency; swap in a tokenizer upstream by passing
  * pre-joined text.
  */
object GenEval {

  private def r6(c: Column): Column = round(c, 6) + lit(0.0)
  private def f1Of(p: Column, r: Column): Column =
    when(p + r > lit(0.0), lit(2.0) * p * r / (p + r)).otherwise(lit(0.0))

  /** Per-pair ROUGE-N: clipped n-gram matches with precision, recall
    * (the ROUGE headline number) and F1. Returns
    * (idCol, n_match, n_cand, n_ref, precision, recall, f1) — counts
    * are n-gram totals on each side; metrics 0 when a side has no
    * n-grams. */
  def rougeN(pairs: DataFrame, idCol: String, candCol: String,
             refCol: String, n: Int): DataFrame = {
    require(n >= 1, s"rougeN: n must be >= 1, got $n")
    val scored = pairs.select(col(idCol),
        TextOps.tokens(col(candCol)).as("__c"),
        TextOps.tokens(col(refCol)).as("__r"))
      .select(col(idCol),
        TextExpressions.clipped_ngram_matches(col("__c"), col("__r"), n)
          .as("n_match"),
        greatest(size(col("__c")) - (n - 1), lit(0)).cast("long").as("n_cand"),
        greatest(size(col("__r")) - (n - 1), lit(0)).cast("long").as("n_ref"))
    val p = when(col("n_cand") > 0,
      col("n_match").cast("double") / col("n_cand")).otherwise(lit(0.0))
    val r = when(col("n_ref") > 0,
      col("n_match").cast("double") / col("n_ref")).otherwise(lit(0.0))
    scored.select(col(idCol), col("n_match"), col("n_cand"), col("n_ref"),
      r6(p).as("precision"), r6(r).as("recall"), r6(f1Of(p, r)).as("f1"))
  }

  /** Per-pair ROUGE-L: longest-common-subsequence precision/recall/F1
    * over tokens. Returns (idCol, lcs, n_cand, n_ref, precision,
    * recall, f1). */
  def rougeL(pairs: DataFrame, idCol: String, candCol: String,
             refCol: String): DataFrame = {
    val scored = pairs.select(col(idCol),
        TextOps.tokens(col(candCol)).as("__c"),
        TextOps.tokens(col(refCol)).as("__r"))
      .select(col(idCol),
        TextExpressions.lcs_length(col("__c"), col("__r")).as("lcs"),
        size(col("__c")).cast("long").as("n_cand"),
        size(col("__r")).cast("long").as("n_ref"))
    val p = when(col("n_cand") > 0,
      col("lcs").cast("double") / col("n_cand")).otherwise(lit(0.0))
    val r = when(col("n_ref") > 0,
      col("lcs").cast("double") / col("n_ref")).otherwise(lit(0.0))
    scored.select(col(idCol), col("lcs"), col("n_cand"), col("n_ref"),
      r6(p).as("precision"), r6(r).as("recall"), r6(f1Of(p, r)).as("f1"))
  }

  /** Per-pair chrF (Popović 2015): character-n-gram F-beta averaged
    * over orders 1..maxN (the whitespace-stripped character stream, so
    * tokenization differences can't mask surface overlap — the metric
    * of choice for morphologically-rich targets). Returns
    * (idCol, chrf) with beta weighting recall (beta = 2 by default);
    * orders longer than the text contribute F = 0, matching the
    * reference implementation's epsilon-free averaging. Row-local:
    * the char stream is one split/filter, each order one
    * [[graft.functions.ClippedNgramMatches]] kernel call. */
  def chrF(pairs: DataFrame, idCol: String, candCol: String,
           refCol: String, maxN: Int = 6, beta: Double = 2.0): DataFrame = {
    require(maxN >= 1, s"chrF: maxN must be >= 1, got $maxN")
    require(beta > 0, s"chrF: beta must be > 0, got $beta")
    def chars(c: Column): Column =
      filter(split(TextOps.normalizeText(c), ""), ch => ch =!= lit(" "))
    val b2 = lit(beta * beta)
    val withChars = pairs.select(col(idCol),
      chars(col(candCol)).as("__c"), chars(col(refCol)).as("__r"))
    val fPerN: Seq[Column] = (1 to maxN).map { n =>
      val m = TextExpressions.clipped_ngram_matches(col("__c"), col("__r"), n)
        .cast("double")
      val tc = greatest(size(col("__c")) - (n - 1), lit(0))
      val tr = greatest(size(col("__r")) - (n - 1), lit(0))
      val p = when(tc > 0, m / tc).otherwise(lit(0.0))
      val r = when(tr > 0, m / tr).otherwise(lit(0.0))
      when(b2 * p + r > lit(0.0),
        (lit(1.0) + b2) * p * r / (b2 * p + r)).otherwise(lit(0.0))
    }
    withChars.select(col(idCol),
      r6(fPerN.reduce(_ + _) / maxN).as("chrf"))
  }

  /** Corpus-level BLEU-maxN: per-pair clipped matches and candidate
    * n-gram totals summed over the corpus (the standard corpus BLEU —
    * NOT a mean of sentence BLEUs), modified precisions p_1..p_maxN,
    * brevity penalty exp(1 - ref/cand) when the candidate side is
    * shorter, and the BP-weighted geometric mean. One row:
    * (cand_tokens, ref_tokens, p1..pmaxN, bp, bleu); bleu is 0 when
    * any p_n is 0 (the log-space convention).
    *
    * Shape: the per-pair kernel columns ride one projection; the
    * reduction is a single partial-aggregated global agg (2 + 2*maxN
    * scalar sums) — nothing keyed, nothing driver-side. */
  def bleu(pairs: DataFrame, candCol: String, refCol: String,
           maxN: Int = 4): DataFrame = {
    require(maxN >= 1, s"bleu: maxN must be >= 1, got $maxN")
    val perPair = pairs.select(
      TextOps.tokens(col(candCol)).as("__c"),
      TextOps.tokens(col(refCol)).as("__r"))
    val aggs =
      sum(size(col("__c"))).cast("double").as("__lc") +:
      sum(size(col("__r"))).cast("double").as("__lr") +:
      (1 to maxN).flatMap { n =>
        Seq(
          sum(TextExpressions.clipped_ngram_matches(
            col("__c"), col("__r"), n)).cast("double").as(s"__m$n"),
          sum(greatest(size(col("__c")) - (n - 1), lit(0)))
            .cast("double").as(s"__t$n"))
      }
    val summed = perPair.agg(aggs.head, aggs.tail: _*)
    val pN = (1 to maxN).map(n =>
      when(col(s"__t$n") > 0, col(s"__m$n") / col(s"__t$n"))
        .otherwise(lit(0.0)))
    val bp = when(col("__lc") >= col("__lr"), lit(1.0))
      .otherwise(exp(lit(1.0) - col("__lr") / col("__lc")))
    val geo = exp(pN.map(p => log(p)).reduce(_ + _) / maxN)
    val allPos = pN.map(_ > lit(0.0)).reduce(_ && _)
    summed.select(
      (col("__lc").cast("long").as("cand_tokens") +:
       col("__lr").cast("long").as("ref_tokens") +:
       pN.zipWithIndex.map { case (p, i) => r6(p).as(s"p${i + 1}") }) ++
      Seq(r6(bp).as("bp"),
        r6(when(allPos, bp * geo).otherwise(lit(0.0))).as("bleu")): _*)
  }

  /** Corpus diversity report — distinct-n (Li et al. NAACL 2016) and
    * n-gram Shannon entropy per order: the mode-collapse detector for
    * generated/synthetic corpora (a model looping on templates shows
    * LOW distinct-n long before eyeballing catches it), and the
    * diversity counterpart to [[bleu]]'s quality side. One row per
    * `groupCols` value and order n: (groupCols..., n, n_grams,
    * n_distinct, distinct_ratio, entropy) — entropy in nats via the
    * one-pass ln(T) - sum(c ln c)/T identity.
    *
    * Shape: ONE scan stacks every order's grams (the per-order shingle
    * arrays concatenate before the explode), ONE (group, n, gram)-keyed
    * agg — partial-aggregated map-side, key space = vocabulary, not
    * corpus — then a vocabulary-sized second agg down to the report
    * rows. No driver state, no per-order rescans. */
  def diversity(docs: DataFrame, textCol: String, ns: Seq[Int] = Seq(1, 2, 3),
                groupCols: Seq[String] = Nil): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1),
      s"diversity: orders must be >= 1, got $ns")
    val toks = TextOps.tokens(col(textCol))
    val stacked = docs.select(
        groupCols.map(col) :+
          explode(flatten(array(ns.map(n =>
            transform(TextOps.wordShingles(toks, n),
              g => struct(lit(n).as("n"), g.as("g")))): _*))).as("__x"): _*)
      .select(groupCols.map(col) ++
        Seq(col("__x.n").as("n"), col("__x.g").as("__g")): _*)
    val counts = stacked
      .groupBy((groupCols :+ "n").map(col) :+ col("__g"): _*)
      .agg(count(lit(1)).as("__c"))
    val t = sum(col("__c")).cast("double")
    counts.groupBy((groupCols :+ "n").map(col): _*)
      .agg(sum(col("__c")).as("n_grams"),
        count(lit(1)).as("n_distinct"),
        r6(count(lit(1)).cast("double") / t).as("distinct_ratio"),
        r6(log(t) - sum(col("__c").cast("double") * log(col("__c"))) / t)
          .as("entropy"))
  }
}
