package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class LinkageSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("fuzzyBestMatch: blocks bound candidates, distance gates, best match wins") {
    val recs = Seq(
      (1L, "b1", "red widget"),
      (2L, "b1", "red widgets"),  // dist 1 to #1
      (3L, "b1", "red wodget"),   // dist 1 to #1, 2 to #2
      (4L, "b2", "red widget"),   // same text, DIFFERENT block: never a candidate
      (5L, "b1", "completely different thing"))
      .toDF("id", "block", "name")
    val got = Linkage.fuzzyBestMatch(recs, recs, Seq("block"),
        "id", "name", "id", "name", maxDist = 2, k = 1)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 2L, 1L, 1L),  // ties on dist broken by right id: 2 < 3
      (2L, 1L, 1L, 1L),
      (3L, 1L, 1L, 1L)))
    // 4 matched nothing (block mismatch), 5 matched nothing (distance)
  }

  test("fuzzyBestMatch: k > 1 ranks by (dist, right id); self pairs excluded") {
    val recs = Seq(
      (1L, "b", "abcd"), (2L, "b", "abce"), (3L, "b", "abcf"))
      .toDF("id", "block", "name")
    val got = Linkage.fuzzyBestMatch(recs, recs, Seq("block"),
        "id", "name", "id", "name", maxDist = 2, k = 2)
      .where($"left_id" === 1L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L, 1L), (1L, 3L, 1L, 2L)))
  }

  test("fuzzyBestMatch: cross-table linkage keeps id-equal pairs when asked") {
    val a = Seq((1L, "b", "abc")).toDF("id", "block", "name")
    val b = Seq((1L, "b", "abd")).toDF("id2", "block", "name2")
    val got = Linkage.fuzzyBestMatch(a, b, Seq("block"),
        "id", "name", "id2", "name2", maxDist = 2, k = 1, excludeSelf = false)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 1L, 1L)))
  }
}
