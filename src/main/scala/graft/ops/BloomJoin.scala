package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.{toColumn, toExpression}
import org.apache.spark.sql.types.BinaryType

/** Bloom-prefiltered existence joins — the 100 TB shape of "drop every
  * corpus row whose key (does not) appear in a reference set".
  *
  * A plain `left_semi`/`left_anti` join shuffles BOTH sides on the key
  * when the reference side outgrows a broadcast: at corpus scale that is
  * a full shuffle of 100 TB to discard most of it. The standard fix
  * (what Spark's own runtime row-level filtering does for inner joins,
  * but never for semi/anti) is a two-step:
  *
  *   1. aggregate the reference keys into a Bloom filter — a few MB of
  *      bits for hundreds of millions of keys — and inline it into the
  *      plan as a binary literal, evaluated by Spark's codegen'd
  *      `might_contain` against `xxhash64(key)` at the corpus scan;
  *   2. run the EXACT join only on the rows the filter could not
  *      decide. Bloom filters have one-sided error (false positives,
  *      never false negatives), so `might_contain = false` is a proof:
  *      for semi, the row cannot match — drop it at the scan; for anti,
  *      the row cannot have a partner — keep it without joining.
  *
  * Only the `fpp` fraction of true negatives survives to the exact
  * join, so the wide shuffle sees ~(matches + fpp * corpus) rows
  * instead of the full corpus. Results are exactly those of the plain
  * join — the filter only prunes rows the join would discard (semi) or
  * pass through (anti).
  *
  * The anti path evaluates the corpus scan twice (keep-side and
  * check-side); two narrow scans beat one wide shuffle at scale, and
  * under one materialized source (cached frame / reused exchange) the
  * scan is shared anyway. */
object BloomJoin {

  /** Aggregate `small`'s key into a serialized Bloom filter sized for
    * `expectedItems` keys at false-positive rate `fpp`. Distributed
    * build (Spark's BloomFilterAggregate: per-partition filters OR-merged
    * at the driver); only the final bitset leaves the cluster. */
  def bloomBytes(small: DataFrame, key: String,
                 expectedItems: Long, fpp: Double): Array[Byte] = {
    require(expectedItems > 0, s"bloomBytes: expectedItems must be > 0, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"bloomBytes: fpp must be in (0,1), got $fpp")
    // m = -n ln p / (ln 2)^2, the textbook optimal bit count
    val numBits = math.ceil(-expectedItems * math.log(fpp) /
      (math.log(2) * math.log(2))).toLong
    val agg = new BloomFilterAggregate(
      toExpression(xxhash64(col(key))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    // zero reference rows -> the aggregate evals to NULL, not an empty
    // filter; callers must treat null as "nothing can match"
    small.select(toColumn(agg).as("bf")).head.getAs[Array[Byte]](0)
  }

  /** Codegen'd membership probe of `key` against a pre-built filter.
    * One-sided: `false` proves absence; `true` means "possibly present". */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    toColumn(BloomFilterMightContain(
      Literal(bloom, BinaryType), toExpression(xxhash64(key))))

  private def checkKeyTypes(big: DataFrame, small: DataFrame,
                            bigKey: String, smallKey: String): Unit = {
    val bt = big.select(col(bigKey)).schema.head.dataType
    val st = small.select(col(smallKey)).schema.head.dataType
    // xxhash64 hashes the physical type, so int-vs-long keys would probe
    // different bits than they insert — refuse rather than silently
    // degrade the prefilter to a no-op (or worse, break its guarantee)
    require(bt == st,
      s"BloomJoin: key types must match exactly ($bigKey: $bt vs $smallKey: $st) — cast one side")
  }

  /** `big LEFT SEMI JOIN small ON big(bigKey) = small(smallKey)`, with the
    * corpus side pruned at the scan by the reference side's Bloom filter.
    * `expectedItems < 0` (default) sizes the filter from `small.count()`
    * — one cheap job on the small side. */
  def semiJoin(big: DataFrame, small: DataFrame,
               bigKey: String, smallKey: String,
               expectedItems: Long = -1L, fpp: Double = 0.01): DataFrame = {
    checkKeyTypes(big, small, bigKey, smallKey)
    val n = if (expectedItems > 0) expectedItems else math.max(1L, small.count())
    val bloom = bloomBytes(small, smallKey, n, fpp)
    if (bloom == null) return big.where(lit(false)) // empty reference: nothing matches
    val pre = big.where(mightContain(bloom, col(bigKey)))
    pre.join(small, pre(bigKey) === small(smallKey), "left_semi")
  }

  /** `big LEFT ANTI JOIN small ...`: rows the filter clears are kept
    * without ever reaching a join; only possible-members pay the exact
    * anti join. */
  def antiJoin(big: DataFrame, small: DataFrame,
               bigKey: String, smallKey: String,
               expectedItems: Long = -1L, fpp: Double = 0.01): DataFrame = {
    checkKeyTypes(big, small, bigKey, smallKey)
    val n = if (expectedItems > 0) expectedItems else math.max(1L, small.count())
    val bloom = bloomBytes(small, smallKey, n, fpp)
    if (bloom == null) return big // empty reference: every row is a keeper
    val might = mightContain(bloom, col(bigKey))
    val check = big.where(might)
    big.where(!might).unionAll(
      check.join(small, check(bigKey) === small(smallKey), "left_anti"))
  }
}
