package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multivariate profiling aggregates — the numeric-relationship layer of
  * table profiling: pairwise correlations across a column set and
  * per-group linear trends. Both are SINGLE aggregation passes built
  * from Spark's codegen'd moment aggregates (`corr`, `regr_*`): the
  * corpus is scanned once, the output is column-pair / group-domain
  * sized, and there is no join, window, or second scan anywhere.
  */
object Stats {

  /** Pairwise Pearson correlation over `cols`, long form: one row per
    * unordered pair (col_a < col_b), `r` rounded to 4 decimals. All
    * m*(m-1)/2 `corr` aggregates ride ONE global aggregation — a 100-
    * column profile is still a single scan. `+ 0.0` normalises the
    * IEEE -0.0 a tiny negative correlation rounds to, so byte-level
    * result compares are engine-stable. */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"correlationMatrix: need >= 2 columns, got $cols")
    require(cols.forall(c => !c.contains("`") && !c.contains("'")),
      "correlationMatrix: quoted/exotic column names unsupported")
    val pairs = for {
      (a, i) <- cols.zipWithIndex; b <- cols.drop(i + 1)
    } yield (a, b)
    val aggs = pairs.map { case (a, b) =>
      (round(corr(col(a), col(b)), 4) + lit(0.0)).as(s"${a}__${b}")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = pairs
      .map { case (a, b) => s"'$a', '$b', `${a}__${b}`" }
      .mkString(", ")
    wide.select(expr(
      s"stack(${pairs.size}, $stackArgs) AS (col_a, col_b, r)"))
  }

  /** Per-group ordinary-least-squares trend of `yCol` against `xCol`:
    * slope, intercept, r2 and point count via the SQL-standard `regr_*`
    * aggregates — one shuffle on the group keys, moments combined
    * map-side. `xCol` should be pre-scaled to sane units (e.g. days
    * since a fixed epoch, not raw epoch seconds) so slopes survive
    * rounding. */
  def groupedTrend(df: DataFrame, groupCols: Seq[String],
                   xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    df.groupBy(groupCols.map(col): _*)
      .agg(
        (round(regr_slope(y, x), 4) + lit(0.0)).as("slope"),
        (round(regr_intercept(y, x), 4) + lit(0.0)).as("intercept"),
        (round(regr_r2(y, x), 4) + lit(0.0)).as("r2"),
        regr_count(y, x).as("n"))
  }
}
