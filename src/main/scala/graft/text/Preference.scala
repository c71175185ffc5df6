package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Preference-pair (DPO/RLHF reward-data) preparation: a corpus of
  * (prompt, chosen, rejected) triples is only as good as its pair
  * hygiene — identical or near-identical responses teach a reward
  * model nothing, empty sides poison the loss, and token-set overlap
  * quantifies how much signal a pair actually carries.
  *
  * All row-local projections (token arrays + set algebra inside the
  * row): no shuffle, no UDF — pair hygiene over 100 TB of triples runs
  * at scan speed. */
object Preference {

  private def toks(c: Column): Column = TextOps.tokens(c)
  private def nTokens(c: Column): Column =
    when(length(trim(c)) === 0, lit(0L))
      .otherwise(size(toks(c)).cast("long"))

  /** Token-set Jaccard between two text columns (distinct whitespace
    * tokens of the normalized text). 1.0 means the responses use
    * exactly the same vocabulary — a reorder, not a preference. Blank
    * vs blank is defined as 1.0 (identical emptiness); blank vs
    * non-blank as 0.0. */
  def tokenJaccard(a: Column, b: Column): Column = {
    val da = array_distinct(toks(a))
    val db = array_distinct(toks(b))
    val inter = size(array_intersect(da, db)).cast("double")
    val uni = size(array_distinct(array_union(da, db))).cast("double")
    when(length(trim(a)) === 0 && length(trim(b)) === 0, lit(1.0))
      .when(length(trim(a)) === 0 || length(trim(b)) === 0, lit(0.0))
      .otherwise(round(inter / uni, 4))
  }

  /** Per-pair hygiene frame: token counts, chosen/rejected token-set
    * Jaccard, the `identical` verdict (normalized-text equality — the
    * zero-signal case), and `keep`: both responses non-blank, not
    * identical, and Jaccard below `maxJaccard` (a pair whose responses
    * share almost all vocabulary is a reorder/typo-fix, not a
    * preference). */
  def pairStats(df: DataFrame, idCol: String, promptCol: String,
                chosenCol: String, rejectedCol: String,
                maxJaccard: Double = 0.9): DataFrame = {
    val ch = col(chosenCol)
    val rj = col(rejectedCol)
    val identical = TextOps.normalizeText(ch) === TextOps.normalizeText(rj)
    val jac = tokenJaccard(ch, rj)
    df.select(col(idCol),
      nTokens(col(promptCol)).as("n_prompt"),
      nTokens(ch).as("n_chosen"),
      nTokens(rj).as("n_rejected"),
      jac.as("jaccard"),
      identical.as("identical"),
      (nTokens(ch) > 0 && nTokens(rj) > 0 && !identical &&
        jac < maxJaccard).as("keep"))
  }
}
