package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shard-level audit manifest — the tamper-evidence companion of the
  * shard writer ([[graft.etl.Shards]] publishes files + count
  * manifest; this recomputes a content-hashed manifest from ANY copy
  * of the corpus, so a shipped snapshot can be re-audited without
  * trusting the original write: a changed/lost/duplicated document
  * flips exactly its shard's line). Assignment is
  * md5-of-id (the engine's sampling-tier randomness — deterministic
  * across engines, layouts and reruns, never id-contiguity-biased);
  * the content hash is a bitwise-XOR fold of per-document 60-bit
  * md5-prefix fingerprints over (id, normalized text) — XOR commutes,
  * so the fold is ORDER-INDEPENDENT and needs no sort, and both sides
  * of the oracle replay it exactly.
  *
  * Scale shape: one row-local fingerprint projection + ONE shard-keyed
  * aggregation (key space = shard count, partial-aggregated map-side).
  * Nothing is ordered, nothing is collected; at 100 TB the manifest
  * costs one scan.
  */
object Sharding {

  /** 60-bit uniform from md5 of `salt` (replayable in DuckDB as
    * `'0x' || substr(md5(s), 1, 15)`). */
  private def h60(salt: Column): Column =
    conv(substring(md5(salt), 1, 15), 16, 10).cast("long")

  /** Deterministic shard id in [0, nShards) from the document id. */
  def shardOf(id: Column, nShards: Int): Column = {
    require(nShards >= 1, s"shardOf: nShards must be >= 1, got $nShards")
    pmod(h60(concat(lit("shard:"), id.cast("string"))), lit(nShards.toLong))
      .cast("int")
  }

  /** Shard assignment: the input plus a `shard` column. */
  def assign(docs: DataFrame, idCol: String, nShards: Int): DataFrame =
    docs.withColumn("shard", shardOf(col(idCol), nShards))

  /** Reconcile two audits (e.g. the manifest shipped with a snapshot
    * vs one recomputed from a received copy): per shard a verdict —
    * `ok`, `hash_mismatch` (content changed), `count_mismatch` (XOR
    * blind spot: counts differ, fold cancelled), `missing` (in
    * `expected` only), `extra` (in `actual` only). Shard-count-sized
    * frames; one full-outer join. */
  def auditDiff(expected: DataFrame, actual: DataFrame): DataFrame = {
    val e = expected.select(col("shard"), col("n_docs").as("__ed"),
      col("content_hash").as("__eh"))
    val a = actual.select(col("shard"), col("n_docs").as("__ad"),
      col("content_hash").as("__ah"))
    e.join(a, Seq("shard"), "full_outer")
      .select(col("shard"),
        when(col("__ed").isNull, lit("extra"))
          .when(col("__ad").isNull, lit("missing"))
          .when(col("__eh") =!= col("__ah"), lit("hash_mismatch"))
          .when(col("__ed") =!= col("__ad"), lit("count_mismatch"))
          .otherwise(lit("ok")).as("status"))
  }

  /** The audit: per shard (shard, n_docs, n_tokens,
    * content_hash, min_id, max_id). `content_hash` XOR-folds the
    * per-doc 60-bit fingerprint of (id, normalized text): any changed,
    * missing or extra document flips its shard's hash; `n_docs`
    * catches the XOR blind spot (a document duplicated an even number
    * of times cancels in the fold but not in the count). Empty shards
    * simply have no row — N comes from the writer's config. */
  def audit(docs: DataFrame, idCol: String, textCol: String,
               nShards: Int): DataFrame = {
    val fp = h60(concat(col(idCol).cast("string"), lit(":"),
      TextOps.normalizeText(col(textCol))))
    docs
      .select(shardOf(col(idCol), nShards).as("shard"),
        col(idCol).as("__id"),
        size(TextOps.tokens(col(textCol))).cast("long").as("__nt"),
        fp.as("__fp"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("n_tokens"),
        bit_xor(col("__fp")).as("content_hash"),
        min(col("__id")).as("min_id"),
        max(col("__id")).as("max_id"))
  }
}
