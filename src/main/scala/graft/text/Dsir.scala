package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR — Data Selection with Importance Resampling (Xie et al.,
  * NeurIPS 2023, arXiv:2302.03169): select raw-corpus documents whose
  * n-gram distribution looks like a small trusted target corpus, by
  * (1) fitting cheap bag-of-feature language models to both corpora,
  * (2) scoring every raw document with its log importance weight
  * `log p_target(doc) - log p_raw(doc)`, and (3) drawing the training
  * subset by Gumbel top-k over those weights, which is equivalent to
  * sampling WITHOUT replacement proportionally to the importance
  * weights (Vieira 2014). The domain-targeted cousin of the quality
  * classifier: no labels needed, just an exemplar corpus.
  *
  * Features are word unigrams + bigrams under the engine's standard
  * tokenization ([[TextOps.tokens]]) with open-vocabulary add-k
  * smoothing — the same statistical treatment as
  * [[TextOps.bigramLmTrain]], so the whole family is exactly
  * reproducible by the SQL oracle (no hashing in the model itself).
  *
  * Scale shape (the 100 TB path):
  *  - fit is two feature-keyed count aggregations (map-side combined,
  *    key space = corpus vocabulary, Zipf-bounded) + one vocab-sized
  *    full-outer join; the model is a vocab-sized (feature, log_ratio)
  *    frame that stays DISTRIBUTED — nothing collects to the driver
  *    except three scalars (vocab size and the two feature totals).
  *  - scoring explodes each document once and joins on the feature key
  *    — the bigramLmScore shuffle shape; the model side is Zipf-vocab
  *    sized and usually broadcast-able, the corpus streams through.
  *  - resampling is one global top-k (TakeOrderedAndProject: per-
  *    partition heaps, no global sort) over a deterministic Gumbel key
  *    derived from md5(id) — reproducible across runs, partitionings
  *    and engines, the engine-wide md5 selector discipline
  *    ([[graft.functions.Sampling]]).
  */
object Dsir {

  /** A fitted importance model: the vocab-sized (feat, log_ratio)
    * frame and the constant ratio for features unseen in BOTH corpora
    * (the pure smoothing-mass ratio). `ratios` is localCheckpoint'd —
    * it is reused by every scoring call and a frozen model must not
    * recompute when the corpora frames change underneath it. */
  final case class DsirModel(ratios: DataFrame, unseenLogRatio: Double)

  /** (id, feat) with one row per unigram and per bigram occurrence —
    * the hashed-ngram feature map of the paper, minus the hashing (the
    * exact open vocabulary keeps the model oracle-reproducible; at
    * 100 TB the vocab agg is still Zipf-bounded, and a capped variant
    * is one `where(c >= minCount)` away). */
  private def features(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("w"))
      .where(size(col("w")) >= 1)
      .select(col("id"), explode(concat(col("w"), zip_with(
        expr("slice(w, 1, size(w) - 1)"), expr("slice(w, 2, size(w) - 1)"),
        (a, b) => concat_ws(" ", a, b)))).as("feat"))

  /** Fit the importance model: add-k smoothed feature probabilities
    * over the JOINT vocabulary,
    * `log_ratio(f) = log p_target(f) - log p_raw(f)` with
    * `p(f) = (c(f) + k) / (N + k * V)`. Two count aggs, one
    * full-outer join, one scalar agg — no per-document state. */
  def fit(target: DataFrame, raw: DataFrame, textCol: String,
          idCol: String, k: Double = 0.5): DsirModel = {
    require(k > 0, s"Dsir.fit: smoothing k must be > 0, got $k")
    val ct = features(target, idCol, textCol)
      .groupBy(col("feat")).agg(count(lit(1)).as("c_t"))
    val cr = features(raw, idCol, textCol)
      .groupBy(col("feat")).agg(count(lit(1)).as("c_r"))
    val joint = ct.join(cr, Seq("feat"), "full_outer")
      .select(col("feat"), coalesce(col("c_t"), lit(0L)).as("c_t"),
        coalesce(col("c_r"), lit(0L)).as("c_r"))
      .transform(graft.ops.Pins.pin)
    val s = joint.agg(count(lit(1)), sum(col("c_t")), sum(col("c_r"))).head()
    val (v, nt, nr) = (s.getLong(0), s.getLong(1), s.getLong(2))
    require(nt > 0 && nr > 0, "Dsir.fit: both corpora must contain tokens")
    val denomT = nt + k * v
    val denomR = nr + k * v
    val ratios = joint.select(col("feat"),
        (log((col("c_t") + k) / denomT) - log((col("c_r") + k) / denomR))
          .as("log_ratio"))
      .transform(graft.ops.Pins.pin)
    DsirModel(ratios, math.log(denomR / denomT))
  }

  /** Score docs under a fitted model: (id, n_feats, log_weight) where
    * `log_weight = sum over the doc's feature occurrences of
    * log_ratio(f)` — the document's log importance weight. Features
    * outside the joint vocabulary fall back to the constant smoothing-
    * mass ratio via the left join. One explode + one feature-keyed
    * join + one id-keyed agg; `log_weight` is rounded to 4 places (the
    * engine's float-oracle discipline). */
  def logWeights(docs: DataFrame, idCol: String, textCol: String,
                 model: DsirModel): DataFrame =
    features(docs, idCol, textCol)
      .join(model.ratios, Seq("feat"), "left")
      .withColumn("log_ratio",
        coalesce(col("log_ratio"), lit(model.unseenLogRatio)))
      .groupBy(col("id"))
      .agg(count(lit(1)).cast("long").as("n_feats"),
        (round(sum(col("log_ratio")), 4) + lit(0.0)).as("log_weight"))
      .withColumnRenamed("id", idCol)

  /** The n documents drawn by Gumbel top-k over the log importance
    * weights: key = log_weight + Gumbel(md5(id)), take the n largest.
    * Equivalent to importance sampling without replacement (each doc's
    * selection probability proportional to its weight softmax), but
    * deterministic: the Gumbel noise `-ln(-ln(u))` uses the uniform
    * u = md5(id)'s first 13 hex digits over 16^13 (52 bits, exactly a
    * double) — the [[graft.functions.Sampling.weightedSample]] u,
    * reproducible bit-for-bit in any engine with md5. One global top-n
    * (per-partition heaps), no full sort, no rand(). Returns the doc
    * rows of the selection (id plus `passCols`). */
  def resample(docs: DataFrame, idCol: String, textCol: String,
               model: DsirModel, n: Int, passCols: Seq[String] = Nil): DataFrame = {
    require(n >= 1, s"Dsir.resample: n must be >= 1, got $n")
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 13), 16, 10)
      .cast("double") / math.pow(16.0, 13)
    val keyed = logWeights(docs, idCol, textCol, model)
      .join(docs.select((idCol +: passCols).map(col): _*), Seq(idCol))
      .withColumn("__g_key", col("log_weight") - log(-log(u)))
    keyed
      .orderBy(col("__g_key").desc, md5(col(idCol).cast("string")), col(idCol))
      .limit(n)
      .drop("__g_key")
  }
}
