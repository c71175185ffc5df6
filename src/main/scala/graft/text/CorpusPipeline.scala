package graft.text

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preprocessing — the composition a pipeline
  * user actually runs, built from the individual operators in this
  * package:
  *
  *   language filter -> quality filter -> redaction -> exact-dup collapse
  *   -> near-dup cluster drop -> benchmark decontamination
  *
  * Each stage is a narrow transform or an already-scale-shaped operator;
  * the stage order puts the cheap row-local filters FIRST so the
  * expensive pairwise stages (MinHash, connected components) run over the
  * smallest possible survivor set. Returns the cleaned corpus plus a
  * per-stage row-count audit (the numbers a data lead asks for).
  *
  * Audit cost model: ONE scan of the input, total. The row-local prefix
  * (language/quality/gopher/repetition) is audited by computing the
  * keep-flags as COLUMNS on the same scan that feeds the exact-collapse
  * checkpoint: an `observe()` metrics node counts the conditional
  * survivors as rows stream past, and the filter applies AFTER the
  * metrics node — so the predicates are evaluated once, not once for a
  * separate audit aggregate and again for the filtering pass (which
  * would be 2x the most expensive CPU stage at 100 TB, for four
  * numbers). The near-dup and decontamination counts ride the final
  * materialization the same way. The single surviving checkpoint, at
  * `exactKept`, is load-bearing: that frame is re-read by the MinHash
  * stage (twice internally) and by the anti-join.
  */
object CorpusPipeline {

  final case class Thresholds(
      languages: Seq[String] = Seq("en"),
      minTokens: Long = 5,
      maxPunctRatio: Double = 0.3,
      maxRepetitionRatio: Double = 0.6,
      nearDupThreshold: Double = 0.5,
      // Some(n): also drop docs sharing ANY word n-gram with the
      // benchmark (GPT-3 appendix-C decontamination) — catches the
      // partial-overlap contamination (one embedded eval passage) that
      // whole-doc fingerprints and doc-level Jaccard both pass through
      ngramOverlapN: Option[Int] = None,
      // Some("NFC"): unicode-normalize text FIRST, so decomposed vs
      // precomposed byte variants cannot defeat any downstream
      // fingerprint (each stage is oracle-gated standalone:
      // q_x_unicode_normalize / q_x_gopher_quality / q_x_dedup_lines)
      unicodeForm: Option[String] = None,
      // Some(minWords): also require the Gopher appendix-A rules in the
      // row-local prefix (word bounds at minWords, mean word length,
      // symbol ratio, alpha-word ratio, stopword floor at
      // gopherMinStopwords — tune DOWN for corpora whose register
      // rarely uses the canonical function words)
      gopherMinWords: Option[Int] = None,
      gopherMinStopwords: Int = 2,
      // true: also require the Gopher appendix-A REPETITION rules
      // (dup line/para fractions, top/dup n-gram char fractions at the
      // Table A1 thresholds) in the row-local prefix — the other half
      // of the paper's filter, catching templated/boilerplate pages the
      // document-level quality rules miss. Row-local kernel calls, so
      // the stage costs a scan, not a shuffle (oracle-gated standalone:
      // q_x_gopher_repetition)
      gopherRepetition: Boolean = false,
      // Some(sep): C4-style global line dedup after redaction — every
      // non-blank line keeps one corpus-wide occurrence; docs whose text
      // empties out are then dropped (row counts change, audited)
      lineDedupSep: Option[String] = None)

  /** Run the full pipeline. `benchmark` is the eval corpus to
    * decontaminate against (None skips the stage). The audit frame has
    * one row per stage with the surviving row count. */
  def preprocess(docs: DataFrame, idCol: String, textCol: String,
                 benchmark: Option[DataFrame] = None,
                 t: Thresholds = Thresholds()): (DataFrame, Seq[(String, Long)]) = {
    val base0 = docs.select(col(idCol).as("id"), col(textCol).as("text"))
    val base = t.unicodeForm.fold(base0)(form => base0.withColumn("text",
      graft.functions.TextExpressions.unicode_normalize(col("text"), form)))

    val toks = TextOps.tokens(col("text"))
    val langOk = TextOps.langId(toks).isin(t.languages.map(x => x: Any): _*)
    val q = TextOps.qualityFeatures(col("text"))
    val qualOk = q("n_tokens") >= t.minTokens &&
      q("punct_ratio") <= t.maxPunctRatio &&
      TextOps.repetitionRatio(toks) <= t.maxRepetitionRatio
    val gopherOk = t.gopherMinWords.fold(lit(true))(mw =>
      TextOps.gopherKeep(col("text"), minWords = mw,
        minStopwords = t.gopherMinStopwords))
    val repOk = if (t.gopherRepetition)
      TextOps.gopherRepetitionKeep(col("text")) else lit(true)

    // audit of the row-local prefix: keep-flags as columns + observe()
    // BEFORE the filter, all riding the exact-collapse materialization
    // below — the predicates run once, on the one scan of the input
    // (Catalyst cannot push the filter through the metrics node, so the
    // counts see every row)
    val prefixObs = Observation()
    val flagged = base
      .withColumn("__lang_ok", langOk)
      .withColumn("__qual_ok", qualOk)
      .withColumn("__gopher_ok", gopherOk)
      .withColumn("__rep_ok", repOk)
      .observe(prefixObs,
        count(lit(1)).as("input"),
        count(when(col("__lang_ok"), 1)).as("language"),
        count(when(col("__lang_ok") && col("__qual_ok"), 1)).as("quality"),
        count(when(col("__lang_ok") && col("__qual_ok") && col("__gopher_ok"), 1))
          .as("gopher"),
        count(when(col("__lang_ok") && col("__qual_ok") && col("__gopher_ok") &&
          col("__rep_ok"), 1)).as("repetition"))
    val redacted0 = flagged
      .where(col("__lang_ok") && col("__qual_ok") && col("__gopher_ok") &&
        col("__rep_ok"))
      .drop("__lang_ok", "__qual_ok", "__gopher_ok", "__rep_ok")
      .withColumn("text", TextOps.redact(col("text")))
    // optional C4 line dedup: row-preserving by itself, but docs whose
    // every line was a later copy come back blank and are dropped here
    // the line-dedup survivor count rides the exact-collapse
    // materialization below via observe() — no extra execution
    val lineObs = Observation()
    val redacted = t.lineDedupSep.fold(redacted0)(sep =>
      TextOps.dedupLines(redacted0, "id", "text", sep)
        .where(length(trim(col("text"))) > 0)
        .observe(lineObs, count(lit(1)).as("n")))

    // exact collapse: keep the min-id representative per normalized text.
    // This is the ONE checkpoint the pipeline keeps — exactKept feeds both
    // the MinHash stage and the near-dup anti-join, so materializing it
    // once prevents the whole filter+window prefix from re-running per
    // consumer; its count reads the materialized blocks (nearly free).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(TextOps.fingerprintMd5(col("text"))).orderBy(col("id"))
    val exactKept = redacted
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
      .transform(graft.ops.Pins.pin)
    val exactCount = exactKept.count()

    // near-dup clusters over survivors; drop non-representatives
    val pairs = TextOps.minhashDedupPairs(exactKept, "id", "text",
      threshold = t.nearDupThreshold)
    val dropIds = graft.ops.ConnectedComponents
      .keepList(pairs, "id_a", "id_b")
      .where(!col("keep")).select(col("id"))
    // near-dup survivor count rides the final action via observe() —
    // no extra execution of the anti-join just to count it
    val nearObs = Observation()
    val nearKept = exactKept.join(dropIds, Seq("id"), "left_anti")
      .observe(nearObs, count(lit(1)).as("n"))

    val audit = Seq.newBuilder[(String, Long)]
    // the eager checkpoint above was the action that filled prefixObs;
    // get() merely reads the already-delivered metrics row
    def prefix(name: String): Long =
      prefixObs.get(name).asInstanceOf[Number].longValue()
    audit += "input" -> prefix("input")
    audit += "language" -> prefix("language")
    audit += "quality" -> prefix("quality")
    if (t.gopherMinWords.isDefined) audit += "gopher" -> prefix("gopher")
    if (t.gopherRepetition) audit += "repetition" -> prefix("repetition")
    if (t.lineDedupSep.isDefined)
      audit += "line_dedup" -> lineObs.get("n").asInstanceOf[Number].longValue()
    audit += "exact_dedup" -> exactCount

    val clean = benchmark match {
      // the corpus text was redacted upstream, so the benchmark side must
      // pass through the SAME redaction before the fingerprint compare —
      // otherwise a contaminated doc whose benchmark twin contains a
      // URL/email gets a different fingerprint and silently escapes
      // removal (under-decontamination, the one failure mode this stage
      // exists to prevent)
      case Some(b) =>
        // the benchmark must ALSO pass through the same unicode
        // normalization as the corpus (when enabled): a decomposed-form
        // benchmark twin of a precomposed corpus doc would otherwise
        // fingerprint differently and escape removal — the same
        // under-decontamination trap as unredacted benchmark text
        val bNorm = t.unicodeForm.fold(b)(form => b.withColumn("text",
          graft.functions.TextExpressions.unicode_normalize(col("text"), form)))
        val bRed = bNorm.withColumn("text", TextOps.redact(col("text")))
        val c0 = TextOps.decontaminate(nearKept, bRed, "text", "text")
        t.ngramOverlapN match {
          case Some(ng) =>
            // the n-gram stage consumes its input twice (gram probe +
            // anti join), so the exact-decontaminated frame must
            // materialize or the whole upstream (including the MinHash
            // pair subtree) would re-run per consumer; its count then
            // reads the materialized blocks and fills nearObs
            val pinned = c0.transform(graft.ops.Pins.pin)
            val nExact = pinned.count()
            val c = TextOps.decontaminateNgramOverlap(
              pinned, bRed, "id", "text", "text", ng)
            val nFinal = c.count()
            audit += "near_dedup" -> nearObs.get("n").asInstanceOf[Number].longValue()
            audit += "decontaminate" -> nExact
            audit += "decontaminate_ngram" -> nFinal
            c
          case None =>
            val n = c0.count() // one action: also fills nearObs
            audit += "near_dedup" -> nearObs.get("n").asInstanceOf[Number].longValue()
            audit += "decontaminate" -> n
            c0
        }
      case None =>
        val n = nearKept.count()
        audit += "near_dedup" -> n
        nearKept
    }
    (clean, audit.result())
  }

  /** Crawl front-end: run [[Html.mainText]] (markup stripped,
    * boilerplate paragraphs dropped by the JusText-lite rule) and feed
    * the extracted prose through [[preprocess]] unchanged — the
    * HTML-corpus entry point. Extraction is a row-local projection
    * fused into the pipeline's first scan, so the markup pass costs no
    * extra job; pages whose extraction empties out fall to the
    * pipeline's own min-token quality rule (and are counted in its
    * audit) rather than vanishing silently. */
  def preprocessHtml(docs: DataFrame, idCol: String, htmlCol: String,
                     benchmark: Option[DataFrame] = None,
                     t: Thresholds = Thresholds(),
                     minParaChars: Int = 30,
                     minParaStopRatio: Double = 0.05)
      : (DataFrame, Seq[(String, Long)]) =
    preprocess(
      docs.select(col(idCol), Html.mainText(col(htmlCol),
        minParaChars, minParaStopRatio).as("__extracted")),
      idCol, "__extracted", benchmark, t)

  /** SFT/chat front-end — the end-to-end transcript pipeline:
    *
    *   parse -> schema-contract filter -> per-turn PII scrub (INSIDE
    *   the turn, before any rendering) -> chat-template render ->
    *   exact fingerprint dedup -> optional sequence packing
    *
    * The parse/validate/scrub/render prefix is one row-local projection
    * (the JSON parses ONCE; [[Chat.mapContent]] rewrites the parsed
    * array in place), audited by `observe()` on the same scan that
    * feeds the dedup materialization — the [[preprocess]] audit
    * discipline at the chat level. Scrubbing runs per TURN rather than
    * on the rendered string so a PII span can never straddle a
    * `<|role|>` boundary and escape the pattern. Dedup keys on the
    * rendered string's fingerprint (two transcripts that render
    * identically train identically, whatever their JSON spacing).
    * `pseudonymize = true` swaps plain redaction for the
    * linkage-preserving tags of [[TextOps.pseudonymizeAll]].
    * `ctxLen = Some(n)` appends [[Packing.packSegments]], returning the
    * (window, doc) segment map; the dedup checkpoint is then
    * load-bearing — packing consumes its input twice (prefix-sum +
    * window explode). */
  def preprocessChat(docs: DataFrame, idCol: String, jsonCol: String,
                     roles: Seq[String] = Chat.defaultRoles,
                     pseudonymize: Boolean = false,
                     ctxLen: Option[Int] = None)
      : (DataFrame, Seq[(String, Long)]) = {
    val scrub: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (pseudonymize) c => TextOps.pseudonymizeAll(c)
      else c => TextOps.redact(c)
    val obs = Observation()
    val rendered = docs
      .withColumn("__valid", Chat.schemaValid(col(jsonCol), roles))
      .observe(obs,
        count(lit(1)).as("input"),
        count(when(col("__valid"), 1)).as("schema_valid"))
      .where(col("__valid"))
      .select(col(idCol).as("id"),
        Chat.renderTurns(
          Chat.mapContent(Chat.messages(col(jsonCol)), scrub)).as("text"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(TextOps.fingerprintMd5(col("text"))).orderBy(col("id"))
    val kept = rendered
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
      .transform(graft.ops.Pins.pin)
    val nKept = kept.count() // the action that also fills obs
    def g(n: String): Long = obs.get(n).asInstanceOf[Number].longValue()
    val audit = Seq("input" -> g("input"),
      "schema_valid" -> g("schema_valid"), "exact_dedup" -> nKept)
    (ctxLen.fold(kept)(cl => Packing.packSegments(kept, "id", "text", cl)),
      audit)
  }
}
