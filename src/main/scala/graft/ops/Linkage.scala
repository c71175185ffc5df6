package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage — the entity-resolution join: candidate
  * pairs come from an EQUI-join on cheap blocking keys (never a cross
  * join), survive an edit-distance verify, and reduce to the best `k`
  * matches per left record.
  *
  * Scale shape: the only wide operation is the blocking equi-join (one
  * shuffle per side on the block key); the quadratic pair blow-up is
  * bounded per block, so block keys should be chosen with bounded
  * cardinality-per-value (the classic discipline: block on several
  * narrow keys and union, rather than one broad key). `levenshtein` is
  * a codegen'd Spark builtin, so the verify stage stays inside
  * whole-stage codegen; the per-left top-k is a streaming window on the
  * pair set, orders of magnitude below the input. Hot blocks are the
  * skew hazard — cap them upstream (sample or split) the same way
  * [[graft.text.TextOps]] caps LSH buckets.
  */
object Linkage {

  /** Best-k fuzzy matches per left record: equi-join `left` and `right`
    * on `blockCols`, keep pairs with `levenshtein(leftText, rightText)
    * <= maxDist` (and, for self-linkage, distinct ids), rank per left id
    * by (distance, right id) — a total order, so the selected match set
    * is reproducible across runs and engines.
    *
    * `excludeSelf` (default true) drops id-equal pairs — mandatory for
    * self-linkage, harmless for cross-table linkage with disjoint id
    * spaces; pass false when equal ids across the two tables are
    * legitimate matches.
    *
    * Output: (left_id, right_id, dist, rank), rank in [1, k]. */
  def fuzzyBestMatch(left: DataFrame, right: DataFrame,
                     blockCols: Seq[String],
                     leftId: String, leftText: String,
                     rightId: String, rightText: String,
                     maxDist: Int, k: Int = 1,
                     excludeSelf: Boolean = true): DataFrame = {
    require(blockCols.nonEmpty, "fuzzyBestMatch: blocking keys are mandatory")
    require(maxDist >= 0 && k >= 1, s"fuzzyBestMatch: bad maxDist/k $maxDist/$k")
    val l = left.select(
      blockCols.map(col) :+ col(leftId).as("left_id") :+ col(leftText).as("__lt"): _*)
    val r = right.select(
      blockCols.map(col) :+ col(rightId).as("right_id") :+ col(rightText).as("__rt"): _*)
    val pairs = l.join(r, blockCols)
      .where(if (excludeSelf) col("left_id") =!= col("right_id") else lit(true))
      .withColumn("dist", levenshtein(col("__lt"), col("__rt")).cast("long"))
      .where(col("dist") <= maxDist)
    val w = Window.partitionBy(col("left_id"))
      .orderBy(col("dist"), col("right_id"))
    pairs
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("left_id"), col("right_id"), col("dist"), col("rank"))
  }
}
