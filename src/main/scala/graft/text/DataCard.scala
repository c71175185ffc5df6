package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The corpus datasheet: one per-source report row composing the
  * engine's row-local audit signals — volume (docs/tokens), exact-dup
  * ratio (normalized-fingerprint collapse), PII density (the four
  * redaction patterns, counted not replaced), mean Flesch reading
  * ease, and the dominant language with its share. The "data card"
  * a release ships with, produced by ONE pass over the corpus.
  *
  * Scale shape: every per-doc signal is a row-local projection
  * computed in the same scan; the report is one source-keyed
  * aggregation (plus a (source, lang)-keyed one for the language mode
  * — key space = sources x languages, schema-sized). The only
  * non-decomposable piece is the exact-dup distinct count, keyed by
  * source like everything else. */
object DataCard {

  /** Per-source card: source, n_docs, n_tokens, mean_tokens,
    * dup_ratio, pii_per_doc, mean_reading_ease, top_lang,
    * top_lang_share. Language-mode ties break toward the larger
    * language string (deterministic). */
  def perSource(df: DataFrame, idCol: String, textCol: String,
                langCol: String, sourceCol: String): DataFrame = {
    val t = col(textCol)
    val nTok = when(length(trim(t)) === 0, lit(0L))
      .otherwise(size(TextOps.tokens(t)).cast("long"))
    // regex_count kernel: same engine and count as
    // size(regexp_extract_all(...)) — Spark's own regexp_count is
    // RuntimeReplaceable sugar for exactly that — without materializing
    // the matched substrings per row
    val pii = Seq(TextOps.urlPattern, TextOps.emailPattern,
        TextOps.ipv4Pattern, TextOps.phonePattern)
      .map(p => graft.functions.TextExpressions.regex_count(t, p))
      .reduce(_ + _)
    val base = df.select(
      col(sourceCol).as("source"), col(langCol).as("__lang"),
      nTok.as("__ntok"), pii.as("__pii"),
      Readability.readingEase(t).as("__ease"),
      TextOps.fingerprintMd5(t).as("__fp"))
    val main = base.groupBy(col("source")).agg(
      count(lit(1)).cast("long").as("n_docs"),
      sum(col("__ntok")).cast("long").as("n_tokens"),
      round(avg(col("__ntok")), 4).as("mean_tokens"),
      round((count(lit(1)) - countDistinct(col("__fp"))).cast("double") /
        count(lit(1)), 4).as("dup_ratio"),
      round(sum(col("__pii")).cast("double") / count(lit(1)), 4)
        .as("pii_per_doc"),
      (round(avg(col("__ease")), 4) + lit(0.0)).as("mean_reading_ease"))
    val langTop = base.groupBy(col("source"), col("__lang"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("source")).agg(
        max_by(col("__lang"), struct(col("__n"), col("__lang")))
          .as("top_lang"),
        round(max(col("__n")).cast("double") / sum(col("__n")), 4)
          .as("top_lang_share"))
    main.join(langTop, "source")
  }
}
