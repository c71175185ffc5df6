package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — for each left row, the single latest right
  * row with the same key and right-time <= left-time. The feature-join
  * primitive for training-data pipelines: joining events to a versioned
  * dimension as-of the event time prevents target leakage.
  *
  * Spark has no native as-of join; per the custom-operator preference
  * ladder this composes existing operators: an equi-join on the key with
  * the time inequality, then top-1-per-left-row. Catalyst plans the
  * dedup as WindowGroupLimit (map-side partial top-1 before the
  * shuffle), so the blowup from multi-match keys is truncated early.
  * For bounded-history dimensions this is the right plan; an
  * unbounded-history skew case would warrant the custom
  * sort-merge `SparkPlan` sketched in the Scaladoc of
  * spark_guide.md — not needed for any current workload.
  *
  * `tolerance`: optional maximum allowed left-time - right-time; rows
  * with only older matches fall back to nulls (like merge_asof's
  * tolerance).
  */
object AsOf {

  /** The custom-operator form: a dedicated LogicalPlan + Strategy +
    * sort-merge SparkPlan ([[graft.plans.AsOfJoinExec]]) that merges each
    * co-partitioned sorted partition in one pass with O(1) buffered
    * state — use over [[join]] when history per key is unbounded (the
    * composed form materializes every historical match before its top-1
    * truncation). Registers the planner strategy on first use.
    * Key/time columns may be any orderable type (long/timestamp/int/
    * date/string/double run unboxed; others via interpreted ordering). */
  def joinExact(left: DataFrame, right: DataFrame,
                leftKey: String, rightKey: String,
                leftTime: String, rightTime: String,
                rightTiebreak: Option[String] = None): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column '$name' not found"))
    org.apache.spark.sql.graftx.ofRows(spark,
      graft.plans.AsOfJoin(lPlan, rPlan,
        attr(lPlan, leftKey), attr(rPlan, rightKey),
        attr(lPlan, leftTime), attr(rPlan, rightTime),
        rightTiebreak.map(attr(rPlan, _))))
  }

  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           leftId: Seq[String],
           rightTiebreak: Seq[String] = Nil,
           tolerance: Option[Column] = None): DataFrame = {
    val timeCond = tolerance match {
      case Some(tol) =>
        right(rightTime) <= left(leftTime) && right(rightTime) >= left(leftTime) - tol
      case None => right(rightTime) <= left(leftTime)
    }
    val joined = left.join(right,
      left(leftKey) === right(rightKey) && timeCond, "left_outer")
    val order = (col(rightTime).desc_nulls_last +:
      rightTiebreak.map(col(_).desc_nulls_last))
    val w = Window.partitionBy(leftId.map(left(_)): _*).orderBy(order: _*)
    joined.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }
}
