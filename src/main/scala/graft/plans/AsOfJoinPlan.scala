package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join: custom LogicalPlan + Strategy + SparkPlan —
  * the escalation path for point-in-time joins over UNBOUNDED history,
  * where the composed form (inequality join + top-1 window,
  * [[graft.ops.AsOf]]) materializes every historical match per left row
  * before truncating.
  *
  * This physical operator is a streaming sort-merge: both children are
  * hash-clustered on the key and sorted by (key, time [, tiebreak]), and
  * each partition merges in one pass holding ONE buffered right row —
  * O(left + right) work and O(1) state per partition, independent of
  * history depth.
  *
  * Left-outer semantics: unmatched left rows emit nulls on the right.
  * Restriction (by construction of the driver tables; documented): key
  * attributes must be long-comparable and time attributes
  * timestamp/long — comparisons use Ordering on the underlying long.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKey: Attribute, rightKey: Attribute,
                    leftTime: Attribute, rightTime: Attribute,
                    rightTiebreak: Option[Attribute])
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTime: Attribute, rightTime: Attribute,
                        rightTiebreak: Option[Attribute])
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // both sides clustered on the key -> partition i holds the same keys
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // sorted by (key, time [, tiebreak]) so the merge is a single pass and
  // "last row seen at or before t" is deterministic
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)) ++
      rightTiebreak.map(tb =>
        SortOrder(tb, org.apache.spark.sql.catalyst.expressions.Ascending)))

  private def longAt(row: InternalRow, attr: Attribute, offset: Int): Long =
    row.getLong(offset)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
    val rWidth = right.output.length
    require(lKeyIdx >= 0 && lTimeIdx >= 0 && rKeyIdx >= 0 && rTimeIdx >= 0,
      "as-of join attributes not found in child output")

    left.execute().zipPartitions(right.execute()) { (leftIter, rightIter) =>
      val rightBuf = rightIter.buffered
      val nulls = new GenericInternalRow(rWidth)
      val joined = new JoinedRow
      // one buffered candidate per partition: the latest right row whose
      // (key, time) is <= the current left row's
      var candKey = 0L
      var cand: InternalRow = null

      leftIter.map { lRow =>
        val k = lRow.getLong(lKeyIdx)
        val t = lRow.getLong(lTimeIdx)
        // advance the right side up to (k, t)
        var continue = true
        while (continue && rightBuf.hasNext) {
          val head = rightBuf.head
          val rk = head.getLong(rKeyIdx)
          val rt = head.getLong(rTimeIdx)
          if (rk < k || (rk == k && rt <= t)) {
            val consumed = rightBuf.next()
            if (rk == k) { cand = consumed.copy(); candKey = rk }
            continue = true
          } else continue = false
        }
        val matched = cand != null && candKey == k
        joined(lRow, if (matched) cand else nulls)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
