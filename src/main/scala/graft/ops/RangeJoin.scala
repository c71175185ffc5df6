package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range join. Spark plans a non-equi join condition
  * (`p >= s AND p < e`) as BroadcastNestedLoop — O(|points| *
  * |intervals|) comparisons, the classic accidental quadratic once the
  * interval side outgrows a broadcast. The standard rewrite (what
  * Databricks' range-join hint and postgres GiST do under the hood)
  * makes it an EQUI join: quantize the axis into fixed bins, explode
  * each interval to the bins it covers (bounded by width/binSize + 1
  * rows), hash-join points to intervals on the bin id, and re-check the
  * exact predicate on the survivors. One shuffle on bin id, comparisons
  * only within co-binned pairs.
  *
  * `binSize` tuning: ~the typical interval width. Too small explodes
  * the interval side; too large degrades toward all-pairs within a bin.
  * Hot bins (a timestamp everyone touches) are ordinary join skew —
  * AQE skew-join splitting applies. */
object RangeJoin {

  /** Join point rows to interval rows where `pCol` in [`sCol`, `eCol`)
    * — half-open, the time-window convention. Column names must not
    * collide between the two inputs. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pCol: String, sCol: String, eCol: String,
                      binSize: Long): DataFrame = {
    require(binSize >= 1, s"pointInInterval: binSize must be >= 1, got $binSize")
    // empty intervals (e <= s) match nothing and must be dropped BEFORE
    // the bin explode: Spark's sequence(start, stop) runs DESCENDING
    // when start > stop, which would fabricate bins
    val iv = intervals
      .where(col(eCol) > col(sCol))
      .withColumn("__bin", explode(sequence(
        floor(col(sCol) / binSize), floor((col(eCol) - 1) / binSize))))
    val pt = points.withColumn("__bin", floor(col(pCol) / binSize))
    pt.join(iv, Seq("__bin"))
      .where(col(pCol) >= col(sCol) && col(pCol) < col(eCol))
      .drop("__bin")
  }

  /** Interval-interval OVERLAP join under the same binning rewrite:
    * [ls, le) and [rs, re) overlap iff ls < re AND rs < le. Both sides
    * explode to their covered bins and hash-join on the bin id — but an
    * overlapping pair shares MANY bins, so instead of a wide distinct
    * the pair is emitted exactly once, from its canonical FIRST shared
    * bin: bin(max(ls, rs)). bin() is monotone, so that equals
    * greatest(bin(ls), bin(rs)), and an overlapping pair always covers
    * it on both sides (max(ls, rs) < min(le, re)) — a pure filter, no
    * dedup shuffle. Exact predicate re-checked on survivors; empty
    * intervals dropped before the explode on BOTH sides (the
    * pointInInterval caveat). Column names must not collide. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lStart: String, lEnd: String,
                      rStart: String, rEnd: String,
                      binSize: Long): DataFrame = {
    require(binSize >= 1, s"intervalOverlap: binSize must be >= 1, got $binSize")
    def binned(df: DataFrame, s: String, e: String): DataFrame =
      df.where(col(e) > col(s))
        .withColumn("__bin", explode(sequence(
          floor(col(s) / binSize), floor((col(e) - 1) / binSize))))
    binned(left, lStart, lEnd)
      .join(binned(right, rStart, rEnd), Seq("__bin"))
      .where(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .where(col("__bin") ===
        greatest(floor(col(lStart) / binSize), floor(col(rStart) / binSize)))
      .drop("__bin")
  }
}
