package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix scans. A global running total in some key order is
  * the primitive under sequence packing, deterministic corpus shuffling,
  * and offset assignment — and the naive `Window.orderBy(key)` plans it
  * as a SINGLE-PARTITION sort, the classic accidental scale-killer.
  *
  * The shape here is the textbook two-phase scan: range-partition by the
  * key, per-partition running sums (parallel windows), a driver-side
  * exclusive prefix over the per-partition totals (numPartitions longs —
  * trivially small), broadcast back in. One range shuffle, one tiny
  * collect, no single-partition stage at any input size. */
object Scans {

  /** Add `outCol` = the sum of `valueCol` over all rows STRICTLY BEFORE
    * this one in `orderCol` order (exclusive prefix sum). `orderCol`
    * must be unique — with ties the order, and hence the prefix, would
    * be partition-dependent; `valueCol` is summed as a long. */
  def exclusivePrefixSum(df: DataFrame, orderCol: String, valueCol: String,
                         outCol: String): DataFrame = {
    require(!df.columns.contains("__pid") && !df.columns.contains("__poff"),
      "exclusivePrefixSum: input already has a __pid/__poff column")
    // localCheckpoint pins the range boundaries: the frame feeds both the
    // per-partition-totals collect and the main query, and must see ONE
    // consistent partitioning (range sampling is not replay-stable)
    val spread = df
      .repartitionByRange(col(orderCol))
      .sortWithinPartitions(orderCol)
      .withColumn("__pid", spark_partition_id())
      .transform(graft.ops.Pins.pin)
    val totals = spread.groupBy(col("__pid"))
      .agg(sum(col(valueCol).cast("long")).as("tot"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, tot)) =>
      (pid, acc + tot)
    }.init.map(_._2) // exclusive prefix: offset of partition i = sum of totals < i
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = totals.map(_._1).zip(offsets).toSeq.toDF("__pid", "__poff")
    val w = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
    spread.join(broadcast(offsetDf), Seq("__pid"))
      .withColumn(outCol,
        col("__poff") + sum(col(valueCol).cast("long")).over(w) -
          col(valueCol).cast("long"))
      .drop("__pid", "__poff")
  }

  /** Global 1-based row number in `orderCol` order, without the
    * single-partition window `row_number().over(Window.orderBy(...))`
    * plans. The deterministic-corpus-shuffle primitive: order by
    * md5(id) and the result is a reproducible random permutation. */
  def globalRowNumber(df: DataFrame, orderCol: String,
                      outCol: String = "row_num"): DataFrame = {
    require(!df.columns.contains("__one"),
      "globalRowNumber: input already has a __one column")
    exclusivePrefixSum(df.withColumn("__one", lit(1L)), orderCol, "__one", outCol)
      .withColumn(outCol, col(outCol) + 1)
      .drop("__one")
  }
}
