package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Raw-JSONL triage: what a data engineer runs BEFORE committing to a
  * schema — which keys exist, how covered they are, what the known
  * fields hold. A crawled/vendored JSONL drop rarely matches its
  * advertised schema; profiling first is the difference between a
  * tolerant reader configured on evidence and a pipeline that silently
  * nulls a misspelled field at 100 TB.
  *
  * Scale shape: [[keyProfile]] is explode + one hash aggregate whose
  * key space is the SCHEMA width (tiny), not the corpus; the total-doc
  * count rides a broadcast single-row frame, never a driver collect.
  * [[fieldStats]] is one projection + one schema-width aggregate.
  * Malformed JSON rows profile as zero keys — a statistic, not a
  * failure. */
object JsonProfile {

  /** Per top-level key: how many documents carry it and the coverage
    * ratio. The schema-drift radar: a key at 0.97 coverage is a
    * tolerant-read candidate; one at 0.03 is probably a typo of one at
    * 0.97.
    *
    * Numerator and denominator come from ONE scan: posexplode_outer
    * keeps a (null,null) row for malformed/empty docs, a rollup over
    * `key` yields both the per-key counts and a grand-total row whose
    * first-position marker count IS the document count (every doc
    * contributes exactly one pos==0-or-null row). A non-deterministic
    * source (sample, mutating path) therefore can't skew coverage
    * above 1.0 — both sides see the same snapshot. The whole-frame
    * window that spreads the total runs over the aggregated frame,
    * whose size is the schema width, not the corpus. */
  def keyProfile(docs: DataFrame, jsonCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val agg = docs
      .select(posexplode_outer(json_object_keys(col(jsonCol)))
        .as(Seq("pos", "key")))
      .rollup(col("key"))
      .agg(count(when(col("key").isNotNull, 1)).as("n_docs"),
        count(when(col("pos") === 0 || col("pos").isNull, 1)).as("doc_marks"),
        grouping(col("key")).as("is_total"))
    agg
      .withColumn("__tot",
        max(when(col("is_total") === 1, col("doc_marks")))
          .over(Window.partitionBy()))
      .where(col("is_total") === 0 && col("key").isNotNull)
      .select(col("key"), col("n_docs"),
        round(col("n_docs").cast("double") / col("__tot"), 4).as("coverage"))
  }

  /** For KNOWN keys: presence count and mean extracted-string length —
    * the second profiling pass once [[keyProfile]] has named the
    * candidates. One row per requested key, one corpus scan: the
    * per-key extracts ride a single array-of-structs projection that
    * explodes to (key, value), so adding keys widens a projection
    * instead of adding scans. */
  def fieldStats(docs: DataFrame, jsonCol: String,
                 keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "fieldStats: keys must be non-empty")
    val kv = array(keys.map(k => struct(lit(k).as("key"),
      get_json_object(col(jsonCol), s"$$.$k").as("v"))): _*)
    docs.select(explode(kv).as("e"))
      .select(col("e.key").as("key"), col("e.v").as("v"))
      .groupBy(col("key"))
      .agg(count(col("v")).as("n_present"),
        round(avg(length(col("v"))), 4).as("avg_len"))
  }

  /** Filter predicate: every one of `keys` present at the top level —
    * the admission rule a profiled corpus earns. */
  def requireKeys(json: Column, keys: Seq[String]): Column =
    keys.map(k => array_contains(json_object_keys(json), k))
      .reduce(_ && _)
}
