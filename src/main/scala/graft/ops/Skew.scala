package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns for hot keys at scale (SURVEY.md §4 /
  * the 100 TB brief). AQE's skew-join handling covers joins; this covers
  * aggregations whose key distribution is pathological: a two-phase
  * salted aggregation splits each hot key across `saltBuckets` partial
  * groups, then combines — semantics-preserving for decomposable
  * aggregates (sum/count/min/max). */
object Skew {

  /** Two-phase salted sum/count aggregation. `saltFrom` should be a
    * high-cardinality deterministic column (row identity), so partials
    * spread evenly and results are reproducible run to run. */
  def saltedSumCount(df: DataFrame, keys: Seq[String],
                     sumCol: String, saltFrom: Column,
                     saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(saltFrom), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(sumCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$sumCol"),
        sum(col("__pcnt")).as("n"))
  }
}
