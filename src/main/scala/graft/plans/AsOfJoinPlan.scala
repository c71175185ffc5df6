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
  * Key/time comparisons are type-dispatched: long/timestamp/int/date/
  * string/double get a primitive unboxed path; any other orderable type
  * falls back to Catalyst's interpreted ordering. Keys and times are
  * assumed non-null (as in the composed form, where a null never
  * satisfies the inequality).
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

  // the merge streams left rows through unchanged, so the left child's
  // hash-clustering and (key, time) sort order survive — declaring them
  // lets a downstream groupBy/window/join on the same key reuse this
  // exchange instead of shuffling again
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  /** Type-dispatched row-to-row comparator: primitive access for the
    * physically-long/int/string/double types (no boxing in the merge
    * loop), interpreted ordering for anything else orderable. */
  private def comparator(dt: org.apache.spark.sql.types.DataType):
      (InternalRow, Int, InternalRow, Int) => Int = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | TimestampType | TimestampNTZType =>
        (a, i, b, j) => java.lang.Long.compare(a.getLong(i), b.getLong(j))
      case IntegerType | DateType =>
        (a, i, b, j) => java.lang.Integer.compare(a.getInt(i), b.getInt(j))
      case ShortType =>
        (a, i, b, j) => java.lang.Short.compare(a.getShort(i), b.getShort(j))
      case StringType =>
        (a, i, b, j) => a.getUTF8String(i).compareTo(b.getUTF8String(j))
      case DoubleType =>
        (a, i, b, j) => java.lang.Double.compare(a.getDouble(i), b.getDouble(j))
      case FloatType =>
        (a, i, b, j) => java.lang.Float.compare(a.getFloat(i), b.getFloat(j))
      case other =>
        val ord = org.apache.spark.sql.catalyst.util.TypeUtils
          .getInterpretedOrdering(other)
        (a, i, b, j) => ord.compare(a.get(i, other), b.get(j, other))
    }
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
    val rWidth = right.output.length
    require(lKeyIdx >= 0 && lTimeIdx >= 0 && rKeyIdx >= 0 && rTimeIdx >= 0,
      "as-of join attributes not found in child output")
    // Cross-side type mixing is allowed ONLY where the values share both a
    // physical representation AND a unit: TIMESTAMP vs TIMESTAMP_NTZ are
    // both micros-as-long. A raw LongType (epoch millis? sequence
    // numbers?) must NOT be lumped with timestamps — it would merge-join
    // arbitrary units against micros and produce wrong matches with no
    // error — so anything else requires exact dataType equality.
    def family(dt: org.apache.spark.sql.types.DataType): String = {
      import org.apache.spark.sql.types._
      dt match {
        case TimestampType | TimestampNTZType => "timestamp_micros"
        case other => other.toString
      }
    }
    require(family(leftKey.dataType) == family(rightKey.dataType),
      s"as-of key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
    require(family(leftTime.dataType) == family(rightTime.dataType),
      s"as-of time types differ: ${leftTime.dataType} vs ${rightTime.dataType}")
    val keyCmp = comparator(leftKey.dataType)
    val timeCmp = comparator(leftTime.dataType)

    left.execute().zipPartitions(right.execute()) { (leftIter, rightIter) =>
      val rightBuf = rightIter.buffered
      val nulls = new GenericInternalRow(rWidth)
      val joined = new JoinedRow
      // one buffered candidate per partition: the latest right row whose
      // (key, time) is <= the current left row's
      var cand: InternalRow = null

      leftIter.map { lRow =>
        // advance the right side up to (lKey, lTime)
        var continue = true
        while (continue && rightBuf.hasNext) {
          val head = rightBuf.head
          val kc = keyCmp(head, rKeyIdx, lRow, lKeyIdx)
          if (kc < 0 || (kc == 0 && timeCmp(head, rTimeIdx, lRow, lTimeIdx) <= 0)) {
            val consumed = rightBuf.next()
            if (kc == 0) cand = consumed.copy()
            continue = true
          } else continue = false
        }
        val matched = cand != null && keyCmp(cand, rKeyIdx, lRow, lKeyIdx) == 0
        joined(lRow, if (matched) cand else nulls)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
