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

  /** Tukey-fence outliers per group: rows of `valueCol` outside
    * [q1 - factor*iqr, q3 + factor*iqr] of their group's exact
    * quartiles. Two passes — a group-domain-sized quartile aggregation
    * (broadcast back) and one scan that keeps only the flagged rows; the
    * fences ride the same double arithmetic in any engine, so the
    * flagged ROW SET is reproducible, not just approximately similar.
    * For group domains too large to broadcast, drop the hint and let AQE
    * pick the join. */
  def iqrOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  factor: Double = 1.5): DataFrame = {
    require(groupCols.nonEmpty, "iqrOutliers: group columns required")
    val q = df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile($valueCol, 0.25)").as("q1"),
        expr(s"percentile($valueCol, 0.75)").as("q3"))
    df.join(org.apache.spark.sql.functions.broadcast(q), groupCols)
      .withColumn("lo", col("q1") - (col("q3") - col("q1")) * lit(factor))
      .withColumn("hi", col("q3") + (col("q3") - col("q1")) * lit(factor))
      .where(col(valueCol) < col("lo") || col(valueCol) > col("hi"))
      .drop("q1", "q3")
  }

  /** Equi-width histogram of `valueCol`: `bins` buckets spanning
    * [min, max], bucket edges and counts out. One min/max aggregation
    * broadcast into one bucketing scan — two narrow passes, no sort; the
    * max value clamps into the last bucket (`least`), a constant column
    * degenerates to one bucket at bin 0. Bucket arithmetic is written
    * identically to its SQL form so edge doubles bit-match. */
  def histogram(df: DataFrame, valueCol: String, bins: Int): DataFrame = {
    require(bins >= 1, s"histogram: bins must be >= 1, got $bins")
    val v = col(valueCol).cast("double")
    val mm = df.agg(min(v).as("mn"), max(v).as("mx"))
    df.select(v.as("v"))
      .crossJoin(org.apache.spark.sql.functions.broadcast(mm))
      .withColumn("bin",
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(
            floor((col("v") - col("mn")) * lit(bins) / (col("mx") - col("mn"))),
            lit(bins - 1L)).cast("long")))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        first(col("mn")).as("mn"), first(col("mx")).as("mx"))
      .withColumn("bin_lo",
        col("mn") + col("bin") * (col("mx") - col("mn")) / lit(bins))
      .withColumn("bin_hi",
        col("mn") + (col("bin") + lit(1L)) * (col("mx") - col("mn")) / lit(bins))
      .select(col("bin"), col("bin_lo"), col("bin_hi"), col("n"))
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
