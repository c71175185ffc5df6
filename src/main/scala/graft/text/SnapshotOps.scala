package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-version comparison: what changed between two snapshots of a
  * continuously-ingested corpus, and did its token distribution move.
  * The monitoring pair every recurring-crawl pipeline runs before
  * promoting a new snapshot — a diff that is mostly "added" plus a
  * small drift number is a healthy crawl; a large "changed" set or a
  * drift spike is an upstream extraction bug caught before training.
  */
object SnapshotOps {

  /** Row-level diff of two corpus snapshots keyed by `idCol`: one row
    * per id present in either side with status `added` (new side only),
    * `removed` (old side only), `changed` (both, different fingerprint)
    * or `unchanged`. Content equality is the whitespace-normalized md5
    * ([[TextOps.fingerprintMd5]]) — the same canonical form the dedup
    * path keys on, so a diff "change" is exactly a dedup-visible change.
    *
    * Scale: fingerprints are computed in the scan projection (32 bytes
    * per row leave the scan, never the text), then ONE sort-merge full
    * outer join on the id — both sides shuffle once on the join key and
    * nothing else. No broadcast assumption: both snapshots may be huge. */
  def corpusDiff(oldSnap: DataFrame, newSnap: DataFrame,
                 idCol: String, textCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol).as("id"),
      TextOps.fingerprintMd5(col(textCol)).as("__fp_old"))
    val n = newSnap.select(col(idCol).as("id"),
      TextOps.fingerprintMd5(col(textCol)).as("__fp_new"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        when(col("__fp_old").isNull, "added")
          .when(col("__fp_new").isNull, "removed")
          .when(col("__fp_old") === col("__fp_new"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** One-call corpus health report: the scalar audit frame a data lead
    * reads before promoting a snapshot — (metric, value) rows, values
    * rounded to 4 places:
    *
    *  - `n_docs`, `n_tokens`, `mean_doc_tokens`
    *  - `pct_exact_dup`: 1 - distinct fingerprints / docs (the mass an
    *    exact dedup pass would remove)
    *  - `pct_short`: docs under `shortTokens` tokens
    *  - `lang_entropy`: Shannon entropy (nats) of the language mix — a
    *    sudden drop means one language is flooding the crawl
    *
    * Two aggregation jobs over one scan shape each (a global agg with a
    * distinct-fingerprint two-phase count, and a language group-by whose
    * post-shuffle frame is language-sized); the union of five scalar
    * rows is driver-trivial. Exact counts by design — this is the audit
    * of record, and the distinct runs on 32-byte fingerprints, not
    * text. */
  def healthReport(docs: DataFrame, idCol: String, textCol: String,
                   langCol: String, shortTokens: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(idCol).as("id"), col(langCol).as("lang"),
      size(TextOps.tokens(col(textCol))).cast("long").as("n_toks"),
      TextOps.fingerprintMd5(col(textCol)).as("fp"))
    val g = base.agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_toks")).as("n_tokens"),
      avg(col("n_toks")).as("mean_toks"),
      countDistinct(col("fp")).as("n_fp"),
      sum(when(col("n_toks") < shortTokens, 1L).otherwise(0L)).as("n_short"))
      .head()
    val nDocs = g.getAs[Long]("n_docs")
    val langEnt = base.groupBy(col("lang"))
      .agg(count(lit(1)).cast("double").as("c"))
      .agg(sum(when(col("c") > 0,
        (col("c") / nDocs) * -log(col("c") / nDocs)).otherwise(lit(0.0))))
      .head().getDouble(0)
    def r4(x: Double) = BigDecimal(x).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq(
      ("n_docs", nDocs.toDouble),
      ("n_tokens", g.getAs[Long]("n_tokens").toDouble),
      ("mean_doc_tokens", r4(g.getAs[Double]("mean_toks"))),
      ("pct_exact_dup", r4(1.0 - g.getAs[Long]("n_fp").toDouble / nDocs)),
      ("pct_short", r4(g.getAs[Long]("n_short").toDouble / nDocs)),
      ("lang_entropy", r4(langEnt))
    ).toDF("metric", "value")
  }

  /** Jensen-Shannon divergence (natural log, so the ceiling is ln 2)
    * between the token unigram distributions of two corpora, plus the
    * side stats a drift monitor charts: one row
    * (n_tokens_a, n_tokens_b, vocab_a, vocab_b, vocab_union,
    * js_divergence) with the divergence rounded to 4 places.
    *
    * Scale: each side is one explode + hash-aggregate on the token
    * (map-side partial combine does the heavy lifting — the post-shuffle
    * frame is vocabulary-sized, not corpus-sized), then a vocabulary-
    * sized full outer join and a single global sum. The corpus text is
    * scanned exactly once per side; nothing corpus-sized is ever joined
    * or collected. */
  /** [[tokenDrift]] per stratum (language, source): one row per stratum
    * value present in either side, same stats columns plus the stratum.
    * The drift monitor's triage view — a healthy aggregate JS number can
    * hide one source going bad; this shows which. Same cost shape as
    * the global form with the stratum added to every grouping key; the
    * per-stratum totals ride a broadcast join (strata counts are tiny by
    * assumption — they're chart categories). */
  def tokenDriftBy(a: DataFrame, b: DataFrame, textCol: String,
                   stratumCol: String): DataFrame = {
    def counts(d: DataFrame) = d
      .select(col(stratumCol).as("g"),
        explode(TextOps.tokens(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("g"), col("w"))
    val j = counts(a).agg(count(lit(1)).as("ca"))
      .join(counts(b).agg(count(lit(1)).as("cb")), Seq("g", "w"), "full_outer")
      .select(col("g"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val tot = j.groupBy(col("g"))
      .agg(sum(col("ca")).as("ta"), sum(col("cb")).as("tb"),
        count(lit(1)).as("vu"))
    // a stratum present on one side only has ta or tb = 0: its ratio is
    // pinned to 0 (not 0/0 = NaN) and the row degenerates to
    // 0.5 * KL(q || q/2) = ln(2)/2 — the "diverged from nothing"
    // ceiling a monitor should flag, not a NaN
    val p = when(col("ta") > 0, col("ca").cast("double") / col("ta"))
      .otherwise(lit(0.0))
    val q = when(col("tb") > 0, col("cb").cast("double") / col("tb"))
      .otherwise(lit(0.0))
    val m = (p + q) / lit(2.0)
    val term =
      when(col("ca") > 0 && col("ta") > 0, p * log(p / m)).otherwise(lit(0.0)) * lit(0.5) +
      when(col("cb") > 0 && col("tb") > 0, q * log(q / m)).otherwise(lit(0.0)) * lit(0.5)
    j.join(broadcast(tot), Seq("g"))
      .groupBy(col("g"), col("ta"), col("tb"), col("vu"))
      .agg(round(sum(term), 4).as("js_divergence"))
      .select(col("g").as(stratumCol),
        col("ta").as("n_tokens_a"), col("tb").as("n_tokens_b"),
        col("vu").as("vocab_union"), col("js_divergence"))
  }

  def tokenDrift(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    def counts(d: DataFrame) = d
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w"))
    val j = counts(a).agg(count(lit(1)).as("ca"))
      .join(counts(b).agg(count(lit(1)).as("cb")), Seq("w"), "full_outer")
      .select(col("w"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val tot = j.agg(sum(col("ca")).as("ta"), sum(col("cb")).as("tb"),
      count(lit(1)).as("vu"),
      sum(when(col("ca") > 0, 1L).otherwise(0L)).as("va"),
      sum(when(col("cb") > 0, 1L).otherwise(0L)).as("vb"))
    // the totals row is 1 row — the cross join broadcasts it back onto
    // the vocabulary frame so p/q/m are computed in-plan, no driver trip
    val p = col("ca").cast("double") / col("ta")
    val q = col("cb").cast("double") / col("tb")
    val m = (p + q) / lit(2.0)
    val term =
      when(col("ca") > 0, p * log(p / m)).otherwise(lit(0.0)) * lit(0.5) +
      when(col("cb") > 0, q * log(q / m)).otherwise(lit(0.0)) * lit(0.5)
    j.crossJoin(tot)
      .groupBy(col("ta"), col("tb"), col("va"), col("vb"), col("vu"))
      .agg(round(sum(term), 4).as("js_divergence"))
      .select(col("ta").as("n_tokens_a"), col("tb").as("n_tokens_b"),
        col("va").as("vocab_a"), col("vb").as("vocab_b"),
        col("vu").as("vocab_union"), col("js_divergence"))
  }

  // --------------------------------------------------- source forensics

  /** Per-source duplicate mass: for each source, how many of its docs
    * share a normalized fingerprint with ANY other doc in the corpus
    * (including within the source). [[healthReport]] says how much of
    * the corpus is duplicated; this says WHO ships it — the view that
    * turns "12% dup mass" into "drop feed X".
    *
    * One fingerprint projection, one corpus-wide fingerprint count
    * (hash agg keyed on 32-byte md5), one join back — the count frame
    * is vocabulary-of-fingerprints sized and joins on its own key, so
    * nothing corpus-sized shuffles twice. */
  def dupBySource(docs: DataFrame, idCol: String, textCol: String,
                  sourceCol: String): DataFrame = {
    val fp = docs.select(col(sourceCol).as("source"),
      TextOps.fingerprintMd5(col(textCol)).as("__fp"))
    val counts = fp.groupBy(col("__fp")).agg(count(lit(1)).as("__n"))
    fp.join(counts, Seq("__fp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__n") > 1, 1L).otherwise(0L)).as("n_dup_docs"))
      .withColumn("dup_ratio",
        round(col("n_dup_docs").cast("double") / col("n_docs"), 4))
  }

  /** Cross-source content overlap: unordered source pairs that share
    * at least one normalized fingerprint, with the count of shared
    * DISTINCT fingerprints — the mirror/syndication map of a multi-feed
    * corpus (feed B republishing feed A shows up as a heavy A-B edge).
    *
    * Self-join on the fingerprint key: the join input is one row per
    * DISTINCT (fp, source) — bounded by the corpus, and the join
    * output by real sharing, not the cross product; a fingerprint
    * shared by k sources contributes k*(k-1)/2 pairs, which is the
    * answer itself, not blow-up. */
  def sourceOverlap(docs: DataFrame, idCol: String, textCol: String,
                    sourceCol: String): DataFrame = {
    val fp = docs.select(col(sourceCol).as("source"),
        TextOps.fingerprintMd5(col(textCol)).as("__fp"))
      .distinct()
    fp.as("a").join(fp.as("b"),
        col("a.__fp") === col("b.__fp") &&
          col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
  }
}
