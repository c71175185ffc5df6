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

  /** Exact top-k most frequent values per column — the profiling pass
    * next to `Store.columnStats`: (col_name, value, n, rank), values
    * stringified, NULLs excluded, ties broken by value ascending so the
    * result is deterministic. One melt projection + one hash aggregation
    * on (column, value) with map-side combine + a top-k window per
    * column — the same shape at any row count; the output is bounded by
    * k * columns. For genuinely high-cardinality columns the agg frame
    * is vocabulary-sized, the classic word-count discipline. */
  def topValuesPerColumn(df: DataFrame, cols: Seq[String],
                         k: Int): DataFrame = {
    require(cols.nonEmpty, "topValuesPerColumn: no columns given")
    require(k >= 1, s"topValuesPerColumn: k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val melted = df.select(posexplode(array(cols.map(c =>
        col(c).cast("string")): _*)).as(Seq("__i", "value")))
      .select(element_at(
          array(cols.map(lit): _*), col("__i") + 1).as("col_name"),
        col("value"))
      .where(col("value").isNotNull)
    val counted = melted.groupBy(col("col_name"), col("value"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("col_name"))
      .orderBy(col("n").desc, col("value"))
    counted.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("col_name"), col("value"), col("n"), col("rank"))
  }
}
