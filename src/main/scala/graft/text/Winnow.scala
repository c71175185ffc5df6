package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextExpressions

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
  * 2003; the MOSS scheme): position-anchored k-gram fingerprints with
  * the guarantee that ANY shared substring of length >= w + k - 1
  * shares a fingerprint. This is the LOCAL complement of the engine's
  * global near-dup tier — MinHash/SimHash say "these documents are
  * similar overall"; winnowing says "these documents share this
  * passage, here" — the attribution/plagiarism/quote-detection shape
  * of dedup forensics.
  *
  * Scale shape: fingerprinting is the row-local
  * [[graft.functions.WinnowFingerprints]] kernel (one sequential
  * window scan per doc, ~2/(w+1) selection density, whole-stage
  * codegen) + one explode — no shuffle. The overlap report shuffles
  * ONLY fingerprints (a ~2/(w+1) fraction of k-grams, hash + two ids
  * wide — the same "only fingerprints cross the shuffle" discipline as
  * the corpus snapshot diff), groups the pair space by shared hash
  * with a hot-hash cap, and counts distinct shared hashes per pair.
  * Hashes are 60-bit md5 prefixes, so the DuckDB oracle replays them
  * exactly (`'0x' || substr(md5(g), 1, 15)`).
  */
object Winnow {

  /** Per-document fingerprints: (idCol, pos, hash) — `pos` the 1-based
    * character position of the selected k-gram in the NORMALIZED
    * (lowercased, whitespace-collapsed) text, `hash` its 60-bit
    * md5-prefix. Deterministic: per window the minimum hash wins, ties
    * to the rightmost; texts shorter than w grams form one window. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 8, w: Int = 4): DataFrame =
    docs.select(col(idCol),
        explode(TextExpressions.winnow_fingerprints(
          TextOps.normalizeText(col(textCol)), k, w)).as("__fp"))
      .select(col(idCol), col("__fp.pos").as("pos"), col("__fp.hash").as("hash"))

  /** Cross-document overlap report: pairs (left id < right id) ranked
    * by the number of DISTINCT shared fingerprint hashes — the MOSS
    * match list. `minShared` drops noise pairs; `maxDocsPerHash` caps
    * the pair blow-up of boilerplate hashes (a hash shared by half the
    * corpus is template text, not attribution signal — same cap
    * rationale as the LSH bucket cap), with the cap applied to the
    * DISTINCT doc list per hash. Returns (left_id, right_id,
    * n_shared). */
  def overlap(docs: DataFrame, idCol: String, textCol: String,
              k: Int = 8, w: Int = 4, minShared: Int = 2,
              maxDocsPerHash: Int = 50): DataFrame = {
    require(minShared >= 1, s"overlap: minShared must be >= 1, got $minShared")
    require(maxDocsPerHash >= 2,
      s"overlap: maxDocsPerHash must be >= 2, got $maxDocsPerHash")
    // distinct (hash, doc) — positions collapse first so a k-gram
    // repeated WITHIN a doc can't multiply the pair count
    val fp = fingerprints(docs, idCol, textCol, k, w)
      .select(col("hash"), col(idCol).as("__id")).distinct()
    val byHash = fp.groupBy(col("hash"))
      .agg(collect_list(col("__id")).as("__ids"))
      .where(size(col("__ids")).between(2, maxDocsPerHash))
    byHash.select(col("hash"), explode(col("__ids")).as("__l"))
      .join(byHash.select(col("hash"), explode(col("__ids")).as("__r")),
        Seq("hash"))
      .where(col("__l") < col("__r"))
      .groupBy(col("__l").as("left_id"), col("__r").as("right_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}
