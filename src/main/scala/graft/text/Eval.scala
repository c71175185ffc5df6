package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed classifier/selector evaluation — the metrics every
  * data-curation model in this engine (quality classifier, DSIR, LM
  * perplexity filters) needs before its cut-point goes into a 100 TB
  * sweep: ROC AUC, reliability (calibration) bins, precision/recall at
  * a selection budget. All pure DataFrame aggregations; nothing
  * collects to the driver.
  */
object Eval {

  /** ROC AUC via the Mann-Whitney U statistic with average-rank tie
    * handling — identical to the trapezoidal area under the ROC curve.
    *
    * Shape: one score-keyed aggregation (map-side combined) collapses
    * the corpus to per-DISTINCT-SCORE (positives, total) counts, then
    * one ordered running sum over that domain assigns average ranks,
    * then one global agg. The window is unpartitioned BY DESIGN and
    * that is safe: it runs over the distinct-score domain, which is
    * bounded by the score's resolution (scores here are rounded model
    * outputs — thousands of values), not by corpus rows. Returns one
    * row (auc, n_pos, n_neg); auc rounded to 6. */
  def auc(scored: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val byScore = scored
      .groupBy(col(scoreCol).as("__s"))
      .agg(sum(col(labelCol).cast("double")).as("__p"),
        count(lit(1)).cast("double").as("__t"))
    val before = Window.orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("__c", coalesce(sum(col("__t")).over(before), lit(0.0)))
      .agg(sum(col("__p") * (col("__c") + (col("__t") + 1) / 2)).as("__rp"),
        sum(col("__p")).as("__np"), sum(col("__t") - col("__p")).as("__nn"))
      .select(
        (round((col("__rp") - col("__np") * (col("__np") + 1) / 2)
          / (col("__np") * col("__nn")), 6) + lit(0.0)).as("auc"),
        col("__np").cast("long").as("n_pos"),
        col("__nn").cast("long").as("n_neg"))
  }

  /** Reliability diagram: scores in [0, 1] bucketed into `bins` equal
    * bins (the top edge closed), each with its count, mean score and
    * positive fraction. |frac_pos - avg_score| summed with n/N weights
    * is ECE — left to the caller/spec so the frame stays per-bin. One
    * hash aggregation, key space = `bins`. */
  def calibration(scored: DataFrame, scoreCol: String, labelCol: String,
                  bins: Int = 10): DataFrame = {
    require(bins >= 2, s"calibration: bins must be >= 2, got $bins")
    scored
      .groupBy(least(floor(col(scoreCol) * bins), lit(bins - 1)).cast("int")
        .as("bin"))
      .agg(count(lit(1)).cast("long").as("n"),
        (round(avg(col(scoreCol)), 6) + lit(0.0)).as("avg_score"),
        (round(avg(col(labelCol).cast("double")), 6) + lit(0.0)).as("frac_pos"))
  }

  /** Precision/recall of the top-k selection by score (ties broken by
    * `idCol` so the cut is deterministic and layout-independent): one
    * global top-k (per-partition heaps via TakeOrderedAndProject) and
    * one global label count. Returns one row
    * (k, n_pos_topk, precision, recall). */
  def prAtK(scored: DataFrame, idCol: String, scoreCol: String,
            labelCol: String, k: Int): DataFrame = {
    require(k >= 1, s"prAtK: k must be >= 1, got $k")
    val topPos = scored
      .orderBy(col(scoreCol).desc, col(idCol)).limit(k)
      .agg(sum(col(labelCol).cast("double")).as("__tp"),
        count(lit(1)).cast("double").as("__k"))
    val allPos = scored.agg(sum(col(labelCol).cast("double")).as("__ap"))
    topPos.crossJoin(allPos).select(
      col("__k").cast("long").as("k"),
      col("__tp").cast("long").as("n_pos_topk"),
      (round(col("__tp") / col("__k"), 6) + lit(0.0)).as("precision"),
      (round(col("__tp") / col("__ap"), 6) + lit(0.0)).as("recall"))
  }

  // ------------------------------------------ ranked-retrieval metrics

  /** Per-query ranked-retrieval metrics at cutoff `k` — the evaluation
    * side of the ANN/BM25/MMR tier (TREC conventions): for each query in
    * `qrels`, reciprocal rank of the first relevant hit, DCG@k / ideal
    * DCG@k / nDCG@k with the Järvelin-Kekäläinen (2^rel - 1) gain, and
    * recall@k against the query's full relevant set.
    *
    * `ranked`: (queryCol, rankCol 1-based, docCol) — an ANN probe,
    * BM25 run, or MMR rerank. `qrels`: (queryCol, docCol, relCol >= 1).
    * Queries absent from qrels are dropped (nothing is relevant, the
    * metrics are undefined); relevant-set sizes and ideal gains come
    * from ONE pass over qrels.
    *
    * Scale shape: qrels is benchmark-sized, so it rides broadcast into
    * the hit join against the (n_queries x k) run; the per-query aggs
    * shuffle on the query key — bounded by the run, never the corpus.
    * The ideal-DCG window partitions by query OVER QRELS ONLY. */
  def rankMetrics(ranked: DataFrame, qrels: DataFrame, queryCol: String,
                  docCol: String, rankCol: String, relCol: String,
                  k: Int): DataFrame = {
    require(k >= 1, s"rankMetrics: k must be >= 1, got $k")
    val gain = (rel: Column) => (pow(lit(2.0), rel) - 1)
    val disc = (pos: Column) => log(2.0, pos.cast("double") + 1)
    val qr = qrels.select(col(queryCol).as("__q"), col(docCol).as("__d"),
      col(relCol).cast("double").as("__rel"))
    // per-query relevant-set size + ideal DCG@k (rels sorted desc,
    // doc id breaking ties so the ideal ranking is deterministic)
    val wIdeal = Window.partitionBy(col("__q"))
      .orderBy(col("__rel").desc, col("__d"))
    val ideal = qr
      .withColumn("__ir", row_number().over(wIdeal))
      .groupBy(col("__q"))
      .agg(count(lit(1)).cast("long").as("n_rel"),
        sum(when(col("__ir") <= k,
          gain(col("__rel")) / disc(col("__ir")))
          .otherwise(lit(0.0))).as("__idcg"))
    val hits = ranked
      .select(col(queryCol).as("__q"), col(docCol).as("__d"),
        col(rankCol).cast("long").as("__rk"))
      .where(col("__rk") <= k)
      .join(broadcast(qr), Seq("__q", "__d"))
      .groupBy(col("__q"))
      .agg(count(lit(1)).cast("long").as("n_hit"),
        min(col("__rk")).as("__first"),
        sum(gain(col("__rel")) / disc(col("__rk"))).as("__dcg"))
    ideal.join(hits, Seq("__q"), "left")
      .select(col("__q").as(queryCol),
        col("n_rel"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (round(coalesce(lit(1.0) / col("__first"), lit(0.0)), 6)
          + lit(0.0)).as("rr"),
        (round(coalesce(col("__dcg"), lit(0.0)), 6) + lit(0.0)).as("dcg"),
        (round(col("__idcg"), 6) + lit(0.0)).as("idcg"),
        (round(coalesce(col("__dcg"), lit(0.0)) / col("__idcg"), 6)
          + lit(0.0)).as("ndcg"),
        (round(coalesce(col("n_hit"), lit(0L)).cast("double")
          / col("n_rel"), 6) + lit(0.0)).as("recall"))
  }

  /** Macro-averaged summary of [[rankMetrics]]: one row
    * (k, n_queries, mrr, mean_ndcg, mean_recall), each mean over the
    * evaluated (qrels-bearing) queries, rounded to 6. */
  def rankSummary(ranked: DataFrame, qrels: DataFrame, queryCol: String,
                  docCol: String, rankCol: String, relCol: String,
                  k: Int): DataFrame =
    rankMetrics(ranked, qrels, queryCol, docCol, rankCol, relCol, k)
      .agg(count(lit(1)).cast("long").as("n_queries"),
        (round(avg(col("rr")), 6) + lit(0.0)).as("mrr"),
        (round(avg(col("ndcg")), 6) + lit(0.0)).as("mean_ndcg"),
        (round(avg(col("recall")), 6) + lit(0.0)).as("mean_recall"))
      .select(lit(k).cast("long").as("k"), col("n_queries"), col("mrr"),
        col("mean_ndcg"), col("mean_recall"))
}
