package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pointInInterval: half-open bounds, bin-spanning intervals, overlaps, empties") {
    val points = Seq((1L, 0L), (2L, 5L), (3L, 9L), (4L, 10L), (5L, 23L))
      .toDF("pid", "p")
    val intervals = Seq(
      (100L, 0L, 10L),    // spans bins 0..1 at binSize 7: catches p=0,5,9; p=10 excluded (half-open)
      (200L, 8L, 12L),    // overlaps 100: p=9 matches both; catches p=10
      (300L, 40L, 40L),   // empty: e == s, must match nothing (and not fabricate bins)
      (400L, 50L, 45L))   // inverted: ditto
      .toDF("iid", "s0", "e0")
    val got = RangeJoin.pointInInterval(points, intervals, "p", "s0", "e0", binSize = 7)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 100L), (2L, 100L), (3L, 100L), (3L, 200L), (4L, 200L)))
  }

  test("intervalOverlap: agrees with the naive predicate, emits each pair exactly once") {
    // random intervals spanning many bins — the exactly-once claim is
    // the part a hand fixture can miss
    val rnd = new scala.util.Random(7)
    val left = (0L until 80L).map { i =>
      val s = rnd.nextInt(200).toLong; (i, s, s + 1 + rnd.nextInt(40)) }
      .toDF("lid", "ls", "le")
    val right = (0L until 80L).map { i =>
      val s = rnd.nextInt(200).toLong; (i, s, s + 1 + rnd.nextInt(40)) }
      .toDF("rid", "rs", "re")
    for (binSize <- Seq(1L, 7L, 64L)) {
      val got = RangeJoin.intervalOverlap(left, right, "ls", "le", "rs", "re", binSize)
        .select("lid", "rid").as[(Long, Long)].collect()
      val naive = left.join(right, $"ls" < $"re" && $"rs" < $"le")
        .select("lid", "rid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicate pairs at binSize=$binSize")
      assert(got.toSet == naive.toSet, s"mismatch at binSize=$binSize")
    }
  }

  test("intervalOverlap: half-open touching intervals do not overlap; empties dropped") {
    val left = Seq((1L, 0L, 5L), (2L, 10L, 10L)).toDF("lid", "ls", "le")
    val right = Seq((10L, 5L, 9L), (20L, 4L, 6L), (30L, 8L, 3L)).toDF("rid", "rs", "re")
    val got = RangeJoin.intervalOverlap(left, right, "ls", "le", "rs", "re", 4L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    // [0,5) touches [5,9) -> no; overlaps [4,6) -> yes; empty/inverted -> no
    assert(got == Set((1L, 20L)))
  }

  test("the plan is an equi hash join, not a nested loop") {
    val points = (0L until 2000L).map(i => (i, i % 300)).toDF("pid", "p")
    val intervals = (0L until 50L).map(i => (i, i * 5, i * 5 + 9)).toDF("iid", "s0", "e0")
    val q = RangeJoin.pointInInterval(points, intervals, "p", "s0", "e0", binSize = 8)
    q.count()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(1200))
    // and it agrees with the naive predicate
    val naive = points.join(intervals, $"p" >= $"s0" && $"p" < $"e0")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val binned = RangeJoin.pointInInterval(points, intervals, "p", "s0", "e0", binSize = 8)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(binned == naive)
  }
}
