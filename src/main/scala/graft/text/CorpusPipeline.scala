package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preprocessing — the composition a pipeline
  * user actually runs, built from the individual operators in this
  * package:
  *
  *   language filter -> quality filter -> redaction -> exact-dup collapse
  *   -> near-dup cluster drop -> benchmark decontamination
  *
  * Each stage is a narrow transform or an already-scale-shaped operator;
  * the stage order puts the cheap row-local filters FIRST so the
  * expensive pairwise stages (MinHash, connected components) run over the
  * smallest possible survivor set. Returns the cleaned corpus plus a
  * per-stage row-count audit (the numbers a data lead asks for).
  */
object CorpusPipeline {

  final case class Thresholds(
      languages: Seq[String] = Seq("en"),
      minTokens: Long = 5,
      maxPunctRatio: Double = 0.3,
      maxRepetitionRatio: Double = 0.6,
      nearDupThreshold: Double = 0.5)

  /** Run the full pipeline. `benchmark` is the eval corpus to
    * decontaminate against (None skips the stage). The audit frame has
    * one row per stage with the surviving row count — computed with one
    * count per stage boundary, which is the honest price of an audit. */
  def preprocess(docs: DataFrame, idCol: String, textCol: String,
                 benchmark: Option[DataFrame] = None,
                 t: Thresholds = Thresholds()): (DataFrame, Seq[(String, Long)]) = {
    val audit = Seq.newBuilder[(String, Long)]
    // each audited boundary is localCheckpoint'ed: the count then reads
    // the materialized blocks and — critically — every later stage starts
    // from them too, so stage N's work runs once instead of being
    // re-executed by every downstream count (sequential audits otherwise
    // recompute the whole prefix chain per stage)
    def step(name: String, df: DataFrame): DataFrame = {
      val mat = df.localCheckpoint()
      audit += name -> mat.count()
      mat
    }

    val base = docs.select(col(idCol).as("id"), col(textCol).as("text"))
    audit += "input" -> base.count()

    val toks = TextOps.tokens(col("text"))
    val langKept = step("language",
      base.where(TextOps.langId(toks).isin(t.languages.map(x => x: Any): _*)))

    val q = TextOps.qualityFeatures(col("text"))
    val qualityKept = step("quality", langKept
      .where(q("n_tokens") >= t.minTokens &&
        q("punct_ratio") <= t.maxPunctRatio &&
        TextOps.repetitionRatio(toks) <= t.maxRepetitionRatio))

    val redacted = qualityKept.withColumn("text", TextOps.redact(col("text")))

    // exact collapse: keep the min-id representative per normalized text
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(TextOps.fingerprintMd5(col("text"))).orderBy(col("id"))
    val exactKept = step("exact_dedup", redacted
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn"))

    // near-dup clusters over survivors; drop non-representatives
    val pairs = TextOps.minhashDedupPairs(exactKept, "id", "text",
      threshold = t.nearDupThreshold)
    val dropIds = graft.ops.ConnectedComponents
      .keepList(pairs, "id_a", "id_b")
      .where(!col("keep")).select(col("id"))
    val nearKept = step("near_dedup",
      exactKept.join(dropIds, Seq("id"), "left_anti"))

    val clean = benchmark match {
      case Some(b) => step("decontaminate",
        TextOps.decontaminate(nearKept, b, "text", "text"))
      case None => nearKept
    }
    (clean, audit.result())
  }
}
