package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Readability scoring — the classic Flesch family over the corpus:
  * reading ease and Flesch-Kincaid grade level from word, sentence,
  * and syllable counts. A curation signal orthogonal to the Gopher/C4
  * heuristics: flag content far off the target register (legalese in a
  * chat corpus, toddler text in a technical one).
  *
  * Syllables use the standard vowel-group heuristic (runs of
  * `[aeiouy]+` per word, minimum 1) — the same approximation the
  * original readability tooling used; sentences are `[.!?]+` runs
  * (minimum 1 so a fragment still scores). Everything is a row-local
  * projection over the token array — no shuffle, no UDF; scoring
  * 100 TB runs at scan speed. */
object Readability {

  private def words(text: Column): Column = TextOps.tokens(text)

  // Syllable and sentence counts are byte-scan kernels
  // ([[graft.functions.HashOps.syllableRunsSum]] / sentenceRuns):
  // value-identical to the regex forms (maximal [aeiouy]+ / [.!?]+ run
  // counts, min-1 per word), but one codegen'd scan instead of an
  // interpreted per-word lambda materializing a regex match array —
  // the dominant per-row cost of the data card's projection.

  /** Flesch reading ease as a bare column (null for blank text) — the
    * composable form [[flesch]] and the data card build on. */
  def readingEase(text: Column): Column = {
    val w = words(text)
    val nWords = when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(w).cast("long"))
    val nSents = greatest(
      graft.functions.TextExpressions.sentence_runs(text), lit(1L))
      .cast("long")
    val nSyl = graft.functions.TextExpressions.syllable_runs_sum(w)
    when(nWords > 0,
      lit(206.835) - lit(1.015) * (nWords.cast("double") / nSents)
        - lit(84.6) * (nSyl.cast("double") / nWords))
  }

  /** Per-document readability frame: word/sentence/syllable counts,
    * Flesch reading ease (206.835 - 1.015 W/S - 84.6 Syl/W; ~90 =
    * grade school, <30 = academic) and Flesch-Kincaid grade
    * (0.39 W/S + 11.8 Syl/W - 15.59). Blank docs score null. */
  def flesch(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val w = words(t)
    val nWords = when(length(trim(t)) === 0, lit(0L))
      .otherwise(size(w).cast("long"))
    val nSents = greatest(
      graft.functions.TextExpressions.sentence_runs(t), lit(1L))
      .cast("long")
    val nSyl = coalesce(
      graft.functions.TextExpressions.syllable_runs_sum(w), lit(0L))
    val wps = nWords.cast("double") / nSents
    val spw = nSyl.cast("double") / nWords
    df.select(col(idCol),
      nWords.as("n_words"),
      nSents.as("n_sentences"),
      when(nWords > 0, nSyl).otherwise(lit(0L)).as("n_syllables"),
      when(nWords > 0,
        round(lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, 4)
          + lit(0.0)).as("reading_ease"),
      when(nWords > 0,
        round(lit(0.39) * wps + lit(11.8) * spw - lit(15.59), 4)
          + lit(0.0)).as("fk_grade"))
  }
}
