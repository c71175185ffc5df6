package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — multi-column data skipping for
  * the write path.
  *
  * Sorting a table by one column makes parquet row-group min/max stats
  * razor-sharp for THAT column and useless for every other: a filter on
  * the second dimension still reads every file. Interleaving the bits
  * of several bucketed dimensions into one sort key places rows that
  * are close in ALL dimensions into the same file, so each file covers
  * a narrow value range per dimension and a selective filter on ANY of
  * them prunes most files from their footer stats alone — the layout
  * trick behind Delta's OPTIMIZE ZORDER, here as a plain DataFrame
  * rewrite any sink can use.
  *
  * Cost shape at scale: one narrow min/max agg pass (map-side partial,
  * 2 values per dim to the driver) + one range shuffle — the same price
  * as a global sort, paid once at write time. Bucketing is LINEAR
  * between the observed min/max (codegen'd `width_bucket`); heavy skew
  * within a dimension degrades bucket balance but never correctness —
  * the z-value orders rows, it never filters them. */
object Zorder {

  /** Interleave `dims` (already-bucketed ints in [0, 2^bits)) into one
    * Morton key: dim d contributes its bit i at position i*nDims + d,
    * so low-order bits of every dimension land in the low-order key
    * bits. Pure shift/and/or composition — whole-stage codegen keeps
    * this one projection. */
  def interleave(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty, "interleave: need at least one dimension")
    require(bits >= 1 && bits * dims.size <= 62,
      s"interleave: bits * nDims must fit a long, got $bits * ${dims.size}")
    val n = dims.size
    val terms = for {
      i <- 0 until bits
      (d, di) <- dims.zipWithIndex
    } yield shiftleft(shiftright(d, i).bitwiseAND(lit(1L)), i * n + di)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Rewrite `df` into `numPartitions` z-ordered output partitions over
    * `dims` (numeric columns). Content is unchanged — only the row
    * layout moves. Write the result with one file per partition and
    * multi-dimension filters prune at the footer. NULL orders first
    * (bucket 0). */
  def cluster(df: DataFrame, dims: Seq[String], numPartitions: Int,
              bitsPerDim: Int = 12): DataFrame = {
    require(dims.nonEmpty, "cluster: need at least one dimension")
    val zCol = "__graft_z"
    require(!df.columns.contains(zCol), s"cluster: input already has $zCol")
    val nBuckets = 1 << bitsPerDim
    // one pass, partial-agg only: global min/max per dimension
    val aggs = dims.flatMap(d => Seq(min(col(d).cast("double")).as(s"lo_$d"),
      max(col(d).cast("double")).as(s"hi_$d")))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    val bucketed = dims.zipWithIndex.map { case (d, i) =>
      // all-null or empty input leaves null bounds: the dim is constant
      if (bounds.isNullAt(2 * i) || bounds.isNullAt(2 * i + 1)) lit(0L)
      else {
      val lo = bounds.getDouble(2 * i); val hi = bounds.getDouble(2 * i + 1)
      if (lo == hi) lit(0L) // constant dimension carries no information
      else coalesce(
        least(greatest(
          width_bucket(col(d).cast("double"), lit(lo), lit(hi), lit(nBuckets)) - 1,
          lit(0L)), lit(nBuckets - 1L)),
        lit(0L))
      }
    }
    df.withColumn(zCol, interleave(bucketed, bitsPerDim))
      .repartitionByRange(numPartitions, col(zCol))
      .sortWithinPartitions(zCol)
      .drop(zCol)
  }
}
