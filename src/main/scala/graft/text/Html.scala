package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML -> text extraction: the step between a crawled web corpus and
  * every text operator in this engine. A 100 TB crawl is markup-heavy
  * (scripts, styles, navigation chrome) and the training-relevant prose
  * is a minority of the bytes; extraction plus boilerplate paragraph
  * classification (the JusText/trafilatura family of heuristics) is
  * what turns it into a documents table.
  *
  * Deliberately REGEX-CHAIN based, not a DOM parse: every rule is a
  * codegen'd `regexp_replace` (RE2-compatible — no backrefs, no
  * lookaround), so the whole extractor is one whole-stage-codegen
  * projection that an independent SQL engine can reproduce rule for
  * rule — which is exactly how the DuckDB oracle gates it. A DOM parse
  * is more faithful on pathological markup but is a per-row library
  * call no oracle can check; the regex chain's known limit (malformed
  * nesting inside <script> strings) is the standard trade the
  * production extractors make too.
  *
  * Scale shape: every operator here is a row-local projection — no
  * shuffle, no UDF, nothing driver-side. Paragraph classification runs
  * INSIDE array lambdas ([[mainText]]), so main-text extraction never
  * explodes rows.
  */
object Html {

  /** Tags whose boundaries end a text block — their open/close both
    * become paragraph breaks. */
  private val blockTags =
    "p|div|br|li|ul|ol|h[1-6]|tr|table|section|article|header|footer|nav|blockquote|pre"

  /** Markup-stripping chain: drop script/style/comment blocks whole,
    * turn block-tag boundaries into newlines, every other tag into a
    * space, decode the six core entities (&amp; LAST so `&amp;lt;`
    * decodes to the literal `&lt;`, not `<`), then collapse whitespace
    * to single spaces and single newlines. Output: plain text whose
    * `\n` boundaries are the block structure of the page. */
  def stripTags(html: Column): Column = {
    val noBlocks = regexp_replace(regexp_replace(regexp_replace(html,
      "(?i)<script\\b[^>]*>[\\s\\S]*?</script>", ""),
      "(?i)<style\\b[^>]*>[\\s\\S]*?</style>", ""),
      "<!--[\\s\\S]*?-->", "")
    val noTags = regexp_replace(regexp_replace(noBlocks,
      s"(?i)</?(?:$blockTags)\\b[^>]*>", "\n"),
      "<[^>]+>", " ")
    val decoded = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(regexp_replace(noTags,
        "&nbsp;", " "), "&lt;", "<"), "&gt;", ">"),
        "&quot;", "\""), "&#39;", "'"), "&amp;", "&")
    trim(regexp_replace(regexp_replace(decoded,
      "[ \\t\\r]+", " "), " ?\\n[ \\n]*", "\n"))
  }

  /** Anchor count of the raw markup — the link-density signal
    * boilerplate classifiers lean on (navigation chrome is link-dense,
    * prose is not). Counted BEFORE stripping, from `<a` tag opens. */
  def linkCount(html: Column): Column =
    // regex_count kernel: same engine/count, no match-array materialization
    graft.functions.TextExpressions.regex_count(html, "(?i)<a\\b")

  /** Per-paragraph stopword ratio: fraction of whitespace tokens that
    * are English stopwords. Prose runs ~0.3-0.6; menus, code and
    * word-salad boilerplate sit near 0 — the JusText core signal. */
  private def stopRatio(para: Column): Column = {
    val stopEn = typedlit(TextOps.stopwords("en"))
    val toks = split(trim(lower(para)), "\\s+")
    round(size(filter(toks, t => array_contains(stopEn, t)))
      .cast("double") / greatest(size(toks), lit(1)), 4)
  }

  /** Paragraph classification frame: one row per nonempty paragraph of
    * the stripped page — (id, para_idx, n_chars, stop_ratio, keep).
    * `keep` is the JusText-lite rule: long enough AND stopword-dense
    * enough. The audit view of [[mainText]]: same rule, exploded for
    * inspection instead of filtered. */
  def paragraphs(docs: DataFrame, idCol: String, htmlCol: String,
                 minChars: Int = 30, minStopRatio: Double = 0.05): DataFrame =
    docs.select(col(idCol), posexplode(split(stripTags(col(htmlCol)), "\n"))
        .as(Seq("para_idx", "para")))
      .where(length(trim(col("para"))) > 0)
      // stop_ratio lands in a named column FIRST so `keep` reuses it —
      // one evaluation per row by plan shape, not by hoping Catalyst's
      // subexpression elimination catches the duplicate
      .select(col(idCol), col("para_idx").cast("long").as("para_idx"),
        length(col("para")).cast("long").as("n_chars"),
        stopRatio(col("para")).as("stop_ratio"))
      .withColumn("keep",
        col("n_chars") >= minChars && col("stop_ratio") >= minStopRatio)

  /** Main-text extraction: strip the markup, drop boilerplate
    * paragraphs by the [[paragraphs]] rule, rejoin with newlines — all
    * inside array lambdas on the row, so the corpus never explodes and
    * the plan is a single codegen projection. */
  def mainText(html: Column, minChars: Int = 30,
               minStopRatio: Double = 0.05): Column =
    array_join(
      filter(split(stripTags(html), "\n"), p =>
        length(p) >= minChars && stopRatio(p) >= minStopRatio),
      "\n")
}
