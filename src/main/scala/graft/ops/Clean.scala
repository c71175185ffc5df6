package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar cleaning functions (SURVEY.md §2.10). All built-in Catalyst
  * expressions — codegen'd, no UDFs (reference logic cited per function). */
object Clean {

  /** Regex used by the reference to strip `[note N]` markers, case
    * insensitive with optional whitespace (reference: utils.py:133-149). */
  val noteTagPattern = "(?i)\\[\\s*note\\s+\\d+\\s*\\]"

  /** Strip note tags + trim (reference: remove_note_tags, utils.py:133-149). */
  def removeNoteTags(c: Column): Column =
    trim(regexp_replace(c, noteTagPattern, ""))

  /** Apply note cleaning to every string column except the exclusions
    * (the reference never cleans `label`, transformations.py:116-129). */
  def cleanStringColumns(df: DataFrame, exclude: Set[String] = Set("label")): DataFrame = {
    val cleaned = df.schema.fields.map { f =>
      if (f.dataType == org.apache.spark.sql.types.StringType && !exclude(f.name))
        removeNoteTags(col(f.name)).as(f.name)
      else col(f.name)
    }
    df.select(cleaned.toIndexedSeq: _*)
  }

  /** Numeric coercion with null-on-failure, matching
    * pd.to_numeric(errors="coerce") — suppression symbols like ".." and "-"
    * become NULL (reference: validation.py:120-135). */
  def coerceDouble(c: Column): Column = c.cast("double")
  def coerceInt(c: Column): Column = c.cast("int")

  /** Unit-from-parentheses extraction, e.g. "Gas (GWh)" -> "GWh"
    * (reference: transformations.py:39-46). */
  def unitFromParens(c: Column): Column =
    regexp_extract(c, "\\(([^)]*)\\)\\s*$", 1)

  /** Text before the first parenthesis, trimmed, e.g. "Gas (GWh)" -> "Gas"
    * (reference: transformations.py:44). */
  def beforeParens(c: Column): Column =
    trim(regexp_replace(c, "\\s*\\(.*$", ""))
}
