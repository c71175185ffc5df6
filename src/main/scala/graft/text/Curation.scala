package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators beyond the reference surface — the
  * domain-quota / perplexity-bucket / line-filter stages a web-scale
  * pretraining pipeline runs between dedup and mixing (RefinedWeb,
  * CCNet, and C4 respectively). All three are single-shuffle or
  * shuffle-free: curation must stream through a 100 TB corpus, not
  * re-sort it.
  */
object Curation {

  /** Per-source document quota (RefinedWeb-style domain cap): keep at
    * most `cap` documents per `sourceCol` value, preferring the ones
    * that rank best under (`qualityCol` desc, `idCol` asc). Prevents a
    * single crawled domain from dominating the mix — the complement of
    * [[graft.functions.Sampling.trainingMix]], which sets per-stratum
    * targets; this one bounds them.
    *
    * One shuffle on the source key; row_number is a streaming window
    * (no frame buffering), so a pathologically hot domain costs one
    * spilled sort, not memory. Deterministic when `idCol` is unique —
    * the same discipline (and the same caveat) as
    * [[graft.functions.Sampling.stratifiedSample]]. Nulls in
    * `qualityCol` rank last, so unspecified-quality docs are the first
    * dropped. */
  def sourceCap(docs: DataFrame, idCol: String, sourceCol: String,
                qualityCol: String, cap: Int): DataFrame = {
    require(cap >= 1, s"sourceCap: cap must be >= 1, got $cap")
    val rn = "__graft_srccap_rn"
    require(!docs.columns.contains(rn),
      s"sourceCap: input already has a $rn column")
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(col(qualityCol).desc_nulls_last, col(idCol))
    docs.withColumn(rn, row_number().over(w))
      .where(col(rn) <= cap)
      .drop(rn)
  }

  /** CCNet-style perplexity bucketing: score every document with the
    * self-trained bigram LM ([[TextOps.bigramLogProbScores]]) and label
    * it head/middle/tail by score tercile (bucket 1 = highest
    * avg_logprob = least perplexing). CCNet keeps buckets at different
    * rates downstream; the engine's job is the deterministic label.
    *
    * Two modes, same contract as Store.columnStats' exact/approx pair:
    *
    *  - `exactRank = true`: ntile over a single global ordering
    *    (avg_logprob desc, id) — bit-exact, oracle-checkable, but the
    *    final window is one sorted reducer: validation scale only.
    *  - default: cut points from `approx_percentile` (one aggregate,
    *    t-digest partials), broadcast back as literals; assignment is a
    *    stream-through comparison. The 100 TB path — no global sort,
    *    bucket shares approximate the exact terciles to the sketch's
    *    accuracy (spec asserts the shares and the ordering invariant).
    *
    * Returns (id, n_bigrams, avg_logprob, bucket) with `bucket` in
    * 1..nBuckets. */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
                        k: Double = 0.5, nBuckets: Int = 3,
                        exactRank: Boolean = false): DataFrame = {
    require(nBuckets >= 2, s"perplexityBuckets: need >= 2 buckets, got $nBuckets")
    val scored = TextOps.bigramLogProbScores(docs, idCol, textCol, k)
      .withColumnRenamed("id", idCol)
    if (exactRank) {
      scored.withColumn("bucket",
        ntile(nBuckets).over(
          Window.orderBy(col("avg_logprob").desc, col(idCol))).cast("long"))
    } else {
      val probs = (1 until nBuckets).map(i => i.toDouble / nBuckets)
      // cuts(i) = approx quantile at (i+1)/n of the score distribution,
      // ascending; bucket = nBuckets - (#cuts strictly below the score)
      val cuts = scored.agg(percentile_approx(col("avg_logprob"),
          array(probs.map(lit): _*), lit(10000)))
        .head().getSeq[Double](0)
      val nBelow = cuts.map(c => when(col("avg_logprob") > c, 1L).otherwise(0L))
        .reduce(_ + _)
      scored.withColumn("bucket", lit(nBuckets.toLong) - nBelow)
    }
  }

  /** [[perplexityBuckets]] with PER-GROUP cut points — CCNet's actual
    * discipline: head/middle/tail are computed within each language, not
    * over the pooled corpus (a pooled cut would consign every low-
    * resource language to the tail because the LM sees less of it).
    * `byCol` is the grouping column (typically the language).
    *
    * exactRank mode partitions the ntile window by the group — parallel
    * across groups, one sorted reducer per group (validation scale, and
    * the oracle gate). Default mode computes `approx_percentile` cuts
    * PER GROUP in one aggregate and broadcasts the tiny cuts table back;
    * assignment stays a stream-through comparison — the 100 TB path. */
  def perplexityBucketsBy(docs: DataFrame, idCol: String, textCol: String,
                          byCol: String, k: Double = 0.5, nBuckets: Int = 3,
                          exactRank: Boolean = false): DataFrame = {
    require(nBuckets >= 2, s"perplexityBucketsBy: need >= 2 buckets, got $nBuckets")
    val scored = TextOps.bigramLogProbScores(docs, idCol, textCol, k)
      .withColumnRenamed("id", idCol)
      .join(docs.select(col(idCol), col(byCol)), Seq(idCol))
    if (exactRank) {
      scored.withColumn("bucket",
        ntile(nBuckets).over(Window.partitionBy(col(byCol))
          .orderBy(col("avg_logprob").desc, col(idCol))).cast("long"))
    } else {
      val probs = (1 until nBuckets).map(i => i.toDouble / nBuckets)
      val cuts = scored.groupBy(col(byCol))
        .agg(percentile_approx(col("avg_logprob"),
          array(probs.map(lit): _*), lit(10000)).as("__cuts"))
      val nBelow = (0 until nBuckets - 1)
        .map(i => when(col("avg_logprob") > element_at(col("__cuts"), i + 1), 1L)
          .otherwise(0L))
        .reduce(_ + _)
      scored.join(broadcast(cuts), Seq(byCol))
        .withColumn("bucket", lit(nBuckets.toLong) - nBelow)
        .drop("__cuts")
    }
  }

  /** C4-style line-level cleaning (Raffel et al. 2020 §2.2, minus the
    * langdetect step which [[TextOps.langId]] owns): a document's text
    * is split into lines; a line survives if it has at least
    * `minLineWords` words, ends in terminal punctuation (when
    * `requireTerminalPunct`), and contains no blocklisted phrase
    * (case-insensitive). The document survives if at least
    * `minKeptLines` lines remain and (when `dropBraces`) it contains no
    * curly brace — C4's code-detection heuristic.
    *
    * Pure projection + filter over array columns: no shuffle, no UDF,
    * whole-stage codegen end to end — the filter streams through the
    * corpus scan at I/O speed, which is the only acceptable cost for a
    * stage that runs before dedup has shrunk anything.
    *
    * Returns kept documents as (id, text_clean, total_lines,
    * kept_lines). */
  def c4LineFilter(docs: DataFrame, idCol: String, textCol: String,
                   minLineWords: Int = 5,
                   requireTerminalPunct: Boolean = true,
                   blocklist: Seq[String] =
                     Seq("javascript", "cookie", "lorem ipsum"),
                   dropBraces: Boolean = true,
                   minKeptLines: Int = 1): DataFrame = {
    require(minLineWords >= 1, "c4LineFilter: minLineWords must be >= 1")
    require(minKeptLines >= 1, "c4LineFilter: minKeptLines must be >= 1")
    def lineKeep(l: Column): Column = {
      val words = size(split(trim(regexp_replace(l, "\\s+", " ")), " "))
      val wordsOk = words >= minLineWords && trim(l) =!= ""
      val punctOk = if (requireTerminalPunct)
        trim(l).rlike("[.!?\"']$") else lit(true)
      val blockOk = blocklist
        .map(p => !lower(l).contains(p.toLowerCase))
        .foldLeft(lit(true))(_ && _)
      wordsOk && punctOk && blockOk
    }
    val braceOk = if (dropBraces)
      !col(textCol).contains("{") && !col(textCol).contains("}")
    else lit(true)
    docs.where(braceOk)
      .select(col(idCol), split(col(textCol), "\n").as("__lines"))
      .select(col(idCol),
        array_join(filter(col("__lines"), lineKeep _), "\n").as("text_clean"),
        size(col("__lines")).cast("long").as("total_lines"),
        size(filter(col("__lines"), lineKeep _)).cast("long").as("kept_lines"))
      .where(col("kept_lines") >= minKeptLines)
  }
}
