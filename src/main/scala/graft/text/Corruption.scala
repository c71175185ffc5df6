package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic pretraining-objective transforms — the last prep step
  * before sharding: fill-in-the-middle splits (Bavarian et al. 2022,
  * "Efficient Training of Language Models to Fill in the Middle") and
  * T5-style span corruption (Raffel et al. 2020). Both are pure
  * row-local projections (no UDF, no shuffle) whose "randomness" is
  * md5-derived from the document id — deterministic across engines,
  * layouts and reruns, exactly like the engine's sampling tier
  * ([[graft.functions.Sampling]]'s md5-prefix rules), which is what
  * makes them oracle-gateable AND idempotent on re-generation.
  */
object Corruption {

  /** 60-bit uniform from md5 of `salt` (engine-replayable:
    * `'0x' || substr(md5(s), 1, 15)` in DuckDB). */
  private def h60(salt: Column): Column =
    conv(substring(md5(salt), 1, 15), 16, 10).cast("long")

  /** Fill-in-the-middle split: two md5-derived character cuts
    * partition each document into (prefix, middle, suffix); `psm` is
    * the PSM rendering `<PRE>prefix<SUF>suffix<MID>middle` the FIM
    * paper trains on. Cuts are drawn on the NORMALIZED text: c1 in
    * [1, L-2], c2 in [c1+1, L-1], each from an independent md5 channel
    * (ordered by construction via modular ranges — not sorted draws —
    * so SQL replays the pair with two scalar expressions); all three
    * parts are non-empty for eligible docs. Documents shorter than
    * `minChars` pass through unsplit (whole text as prefix, empty
    * middle/suffix in the psm rendering) — the paper's FIM-rate
    * carve-out. */
  def fimSplit(docs: DataFrame, idCol: String, textCol: String,
               minChars: Int = 16): DataFrame = {
    require(minChars >= 3, s"fimSplit: minChars must be >= 3, got $minChars")
    val t = TextOps.normalizeText(col(textCol))
    val L = length(t)
    // c1 in [1, L-2], then c2 in [c1+1, L-1] (char positions AFTER
    // which to cut) — both sides non-empty, middle possibly empty
    val c1 = (h60(concat(lit("fim:1:"), col(idCol).cast("string")))
      % (L - 2).cast("long") + 1).cast("int")
    val c2 = (c1 + (h60(concat(lit("fim:2:"), col(idCol).cast("string")))
      % (L - 1 - c1).cast("long") + 1).cast("int"))
    val eligible = L >= minChars
    docs.select(col(idCol),
        when(eligible, c1).otherwise(length(t)).as("__c1"),
        when(eligible, c2).otherwise(length(t)).as("__c2"),
        t.as("__t"))
      .select(col(idCol),
        col("__c1").cast("long").as("cut1"),
        col("__c2").cast("long").as("cut2"),
        col("__t").substr(lit(1), col("__c1")).as("prefix"),
        col("__t").substr(col("__c1") + 1, col("__c2") - col("__c1")).as("middle"),
        col("__t").substr(col("__c2") + 1, length(col("__t"))).as("suffix"))
      .withColumn("psm", concat(lit("<PRE>"), col("prefix"),
        lit("<SUF>"), col("suffix"), lit("<MID>"), col("middle")))
  }

  /** T5-style span corruption, BLOCK formulation: tokens are cut into
    * fixed blocks of `blockSize`; inside block b of a document one
    * span of `spanLen` tokens starting at an md5-derived offset is
    * replaced by the sentinel `<extra_id_b>`; `targets` collects
    * sentinel-prefixed masked spans in order. Corruption rate =
    * spanLen/blockSize by construction.
    *
    * The classic i.i.d.-span formulation needs a sequential
    * no-overlap walk; the block formulation masks the SAME expected
    * fraction with zero sequential dependency — every block is
    * independent, so the whole transform is two nested row-local
    * array expressions and SQL can replay it block by block. A
    * trailing short block (< blockSize tokens) is left unmasked —
    * deterministic and simpler than rescaling the span. Returns
    * (idCol, n_tokens, n_masked, inputs, targets). */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String,
                  blockSize: Int = 20, spanLen: Int = 3): DataFrame = {
    require(blockSize >= 2 && spanLen >= 1 && spanLen < blockSize,
      s"spanCorrupt: need 1 <= spanLen < blockSize, got $spanLen/$blockSize")
    val toks = TextOps.tokens(col(textCol))
    // `/` on ints is double division in Spark SQL — floor+cast keeps
    // the block count integral so sequence() below type-checks
    val nBlocks = floor(size(toks) / blockSize).cast("int") // full blocks only
    val id = col(idCol).cast("string")
    // sequence(0, nb-1) is illegal at nb = 0 (step-sign check), so the
    // block index list is built guarded; transforms of [] are []
    val blockIdx = when(nBlocks > 0,
      sequence(lit(0), nBlocks - 1, lit(1)))
      .otherwise(array().cast("array<int>"))
    docs.select(col(idCol), toks.as("__w"), nBlocks.as("__nb"),
        blockIdx.as("__bs"))
      .select(col(idCol), col("__w"), col("__nb"), col("__bs"),
        // per full block: md5-derived span start (0-based in-block)
        transform(col("__bs"), b =>
          (h60(concat(lit("span:"), id, lit(":"), b.cast("string")))
            % lit(blockSize - spanLen + 1)).cast("int")).as("__starts"))
      .select(col(idCol),
        size(col("__w")).cast("long").as("n_tokens"),
        (col("__nb") * spanLen).cast("long").as("n_masked"),
        // inputs: walk blocks; masked span collapses to one sentinel
        concat_ws(" ", flatten(concat(
          transform(col("__bs"), b => {
            val base = b * blockSize
            val st = element_at(col("__starts"), b + 1)
            concat(
              slice(col("__w"), base + 1, st),
              array(concat(lit("<extra_id_"), b.cast("string"), lit(">"))),
              slice(col("__w"), base + st + spanLen + 1,
                lit(blockSize) - st - spanLen))
          }),
          // trailing partial block passes through unmasked
          array(slice(col("__w"), col("__nb") * blockSize + 1,
            size(col("__w")) - col("__nb") * blockSize))))).as("inputs"),
        // targets: sentinel + its masked span, in block order
        concat_ws(" ", flatten(
          transform(col("__bs"), b => {
            val base = b * blockSize
            val st = element_at(col("__starts"), b + 1)
            concat(
              array(concat(lit("<extra_id_"), b.cast("string"), lit(">"))),
              slice(col("__w"), base + st + 1, lit(spanLen)))
          }))).as("targets"))
  }
}
