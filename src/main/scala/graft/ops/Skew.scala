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

  /** Key-distribution diagnostic for a PROSPECTIVE groupBy/join key —
    * run this before committing a 100 TB shuffle to a key you haven't
    * profiled. One row: totals, the heaviest key and its share,
    * median/p99 key sizes (exact, linear-interpolated), the
    * coefficient of variation, and the salt factor that would cap the
    * hottest key's rows-per-task at `targetRowsPerTask`
    * (ceil(max_key_rows / target), min 1 — feed it straight into
    * [[saltedSumCount]] / [[saltedJoin]]).
    *
    * Shape: one keyed count (map-side combined) then one global reduce
    * over the per-key counts — the diagnostic never moves the rows
    * themselves, only the counts. */
  def skewReport(df: DataFrame, keyCols: Seq[String],
                 targetRowsPerTask: Long = 1000000L): DataFrame = {
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .select(concat_ws("|", keyCols.map(c => col(c).cast("string")): _*)
        .as("__key"), col("__n"))
    counts.agg(
      sum(col("__n")).cast("long").as("n_rows"),
      count(lit(1)).cast("long").as("n_keys"),
      max(col("__n")).cast("long").as("max_key_rows"),
      max_by(col("__key"), struct(col("__n"), col("__key"))).as("top_key"),
      round(max(col("__n")).cast("double") / sum(col("__n")), 4)
        .as("top_share"),
      expr("percentile(__n, 0.5)").as("p50_key_rows"),
      expr("percentile(__n, 0.99)").as("p99_key_rows"),
      round(stddev_pop(col("__n")) / avg(col("__n")), 4).as("cv"),
      greatest(lit(1L),
        ceil(max(col("__n")).cast("double") / targetRowsPerTask)
          .cast("long")).as("salt_factor"))
  }
}
