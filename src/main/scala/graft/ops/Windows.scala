package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators (SURVEY.md §2.6) plus keyset pagination
  * (§2.8). Each is expressed with Spark's Window API so Catalyst plans a
  * single shuffle on the partition keys. */
object Windows {

  /** Forward-fill nulls down a partition in `orderCols` order, with an
    * optional default for the leading run (reference: ffill + fillna at
    * transformations.py:494-503). */
  def ffill(df: DataFrame, valueCol: String, partitionCols: Seq[String],
            orderCols: Seq[String], default: Option[Column] = None): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = last(col(valueCol), ignoreNulls = true).over(w)
    df.withColumn(valueCol, default.fold(filled)(d => coalesce(filled, d)))
  }

  /** Latest row per group: row_number()==1 over (partition, order desc).
    * This is the staging snapshot core (reference: MAX(ingest_ts) GROUP BY
    * at read_write.py:362-372, re-expressed as a window dedup).
    * `orderCols` must be a total order (include a unique tiebreaker). */
  def latestPerGroup(df: DataFrame, partitionCols: Seq[String],
                     orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Top-k rows per group under an explicit total order — the
    * per-language "best k documents by quality score" selector. Planned
    * by Catalyst as WindowGroupLimit (Spark 3.5+): each map task keeps
    * only its local top-k per group BEFORE the shuffle, so the exchange
    * carries at most k rows per (group, input partition) instead of the
    * whole table — the distributed-heap shape, asserted by a plan guard
    * in the spec. `order` must be a total order (include a unique
    * tiebreaker) for deterministic results. */
  def topKPerGroup(df: DataFrame, partitionCols: Seq[String],
                   order: Seq[Column], k: Int): DataFrame = {
    require(k >= 1, s"topKPerGroup: k must be >= 1, got $k")
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Rolling RANGE-frame aggregate per key: for every row, the
    * sum/count/avg of `valueCol` over the trailing window
    * [orderVal - lookback, orderVal] within its partition — the
    * trailing-7-day-revenue shape. A RANGE frame (value-based), not
    * ROWS: gaps and ties in the order column behave like the SQL
    * standard. One shuffle on the partition keys; the frame is
    * computed in a single sort-based pass per partition. `orderCol`
    * must be numeric (days since epoch, epoch seconds — the caller
    * picks the unit; `lookback` is in the same unit). */
  def rollingAgg(df: DataFrame, partitionCols: Seq[String],
                 orderCol: String, valueCol: String,
                 lookback: Long): DataFrame = {
    require(lookback >= 0, s"rollingAgg: lookback must be >= 0, got $lookback")
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(orderCol))
      .rangeBetween(-lookback, Window.currentRow)
    df.withColumn("rolling_sum", sum(col(valueCol)).over(w))
      .withColumn("rolling_n", count(col(valueCol)).over(w))
      .withColumn("rolling_avg", avg(col(valueCol)).over(w))
  }

  /** Keyset (cursor) pagination: WHERE key > cursor ORDER BY key LIMIT n
    * (reference: app.py:132-147). Catalyst plans this TakeOrderedAndProject
    * after a pushed-down range filter — no global sort at scale. */
  def keysetPage(df: DataFrame, keyCol: String, cursor: Option[Long],
                 limit: Int): DataFrame = {
    val base = cursor.fold(df)(c => df.filter(col(keyCol) > lit(c)))
    base.orderBy(col(keyCol)).limit(limit)
  }
}
