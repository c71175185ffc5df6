package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Footer-stats table profiling: global COUNT/MIN/MAX answered from
  * parquet footer metadata instead of row scans — the "how big is this
  * table, what's the key range" probe that should cost seconds, not a
  * 100 TB read. Spark's parquet aggregate pushdown (DSv2 reader only)
  * rewrites the scan to return one pre-aggregated row per file, so the
  * job reads O(files) footers, never row groups.
  *
  * Pushdown silently degrades to a full scan when the shape disqualifies
  * it (filters present, nested columns, no stats in the footer) — the
  * result is still correct, just not metadata-speed; [[isPushedDown]]
  * exposes the plan check so callers (and the plan-shape spec) can
  * assert the fast path actually engaged. */
object ScanStats {

  /** Run `body` with the DSv2 parquet reader + aggregate pushdown on,
    * restoring both confs after. The v1/v2 flip is why this is scoped:
    * the v2 reader changes plan shapes for every parquet read in the
    * session, and only the stats probe wants that. */
  private def withPushdown[T](spark: SparkSession)(body: => T): T = {
    val conf = spark.conf
    val prevAgg = conf.getOption("spark.sql.parquet.aggregatePushdown")
    val prevV1 = conf.getOption("spark.sql.sources.useV1SourceList")
    conf.set("spark.sql.parquet.aggregatePushdown", "true")
    conf.set("spark.sql.sources.useV1SourceList",
      prevV1.map(_.split(",").filterNot(_.trim == "parquet").mkString(","))
        .getOrElse(""))
    try body
    finally {
      prevAgg match {
        case Some(v) => conf.set("spark.sql.parquet.aggregatePushdown", v)
        case None    => conf.unset("spark.sql.parquet.aggregatePushdown")
      }
      prevV1 match {
        case Some(v) => conf.set("spark.sql.sources.useV1SourceList", v)
        case None    => conf.unset("spark.sql.sources.useV1SourceList")
      }
    }
  }

  /** One-row frame: (n_rows, <c>_min, <c>_max per requested column),
    * computed under the pushdown-enabled reader. Collected eagerly (the
    * result is one row) so the scoped confs can't leak into the caller's
    * lazily-planned downstream reads. */
  def tableStats(spark: SparkSession, path: String,
                 cols: Seq[String]): DataFrame = withPushdown(spark) {
    val df = spark.read.parquet(path)
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    val res = df.agg(aggs.head, aggs.tail: _*)
    val rows = res.collect()
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), res.schema)
  }

  /** True when the aggregate was answered from footer metadata (the scan
    * node advertises a PushedAggregation). */
  def isPushedDown(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("PushedAggregation: [") && !plan.contains("PushedAggregation: []")
  }

  /** Run the same aggregate as [[tableStats]] and report whether the
    * fast path engaged — the plan-shape probe for specs and ops
    * tooling. */
  def probePushdown(spark: SparkSession, path: String,
                    cols: Seq[String]): Boolean = withPushdown(spark) {
    val df = spark.read.parquet(path)
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    val res = df.agg(aggs.head, aggs.tail: _*)
    res.collect()
    isPushedDown(res)
  }
}
