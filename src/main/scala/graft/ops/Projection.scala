package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Projection helpers (SURVEY.md §2.3 P1-P3). */
object Projection {

  /** Drop columns that are entirely NULL — the reference's presentation-time
    * pruning of unused sparse dimensions (dropna(axis=1, how="all"),
    * facade.py:162). One aggregate pass over all columns, then a plain
    * select — never a per-column job. */
  def dropAllNullColumns(df: DataFrame): DataFrame = {
    val counts = df.select(df.columns.map(c => count(col(c)).as(c)).toIndexedSeq: _*)
      .head()
    val keep = df.columns.zipWithIndex.collect {
      case (c, i) if counts.getLong(i) > 0 => c
    }
    df.select(keep.map(col).toIndexedSeq: _*)
  }
}
