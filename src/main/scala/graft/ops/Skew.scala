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

  /** Salted equi-join for a skewed FACT side: fact rows are salted by a
    * deterministic hash of `saltFrom` (row identity), the dim side is
    * replicated once per salt bucket, and the join key becomes
    * (key, salt) — a hot fact key's rows spread over `saltBuckets`
    * tasks instead of stalling one. Semantics-preserving for inner and
    * left joins (every fact row meets exactly one replica of its dim
    * match).
    *
    * When to use: the dim side is too big to broadcast (broadcast
    * would make skew irrelevant) but cheap enough to replicate
    * `saltBuckets` times; or AQE's runtime skew split is off / can't
    * fire (e.g. the skewed side is already partitioned by the join
    * key from an upstream operation). Dim-side duplicate keys are fine
    * (each duplicate is replicated like any other row). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltFrom: Column, saltBuckets: Int = 16,
                 joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin preserves inner/left semantics only, got $joinType")
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(saltFrom), lit(saltBuckets.toLong)))
    val repDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1L))))
    saltedFact.join(repDim, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
