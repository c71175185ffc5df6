package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** skewReport: the pre-shuffle key diagnostic. */
class SkewReportSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("skewReport profiles a hot key and sizes the salt factor") {
    // key "hot" has 900 rows, keys k0..k9 have 10 each
    val df = ((1 to 900).map(_ => "hot") ++
      (0 until 100).map(i => s"k${i % 10}")).toDF("k")
    val got = Skew.skewReport(df, Seq("k"), targetRowsPerTask = 100)
      .as[(Long, Long, Long, String, Double, Double, Double, Double, Long)]
      .collect().head
    val (nRows, nKeys, maxRows, topKey, topShare, p50, p99, cv, salt) = got
    assert(nRows == 1000L && nKeys == 11L && maxRows == 900L)
    assert(topKey == "hot" && topShare == 0.9)
    assert(p50 == 10.0)
    assert(p99 > 800.0) // interpolating toward the hot key
    assert(cv > 2.0)    // pathological distribution
    assert(salt == 9L)  // ceil(900 / 100)
  }

  test("skewReport on a uniform key: salt factor 1, cv ~ 0") {
    val df = (0 until 1000).map(i => (s"u${i % 10}", i)).toDF("k", "v")
    val got = Skew.skewReport(df, Seq("k"), targetRowsPerTask = 1000)
      .as[(Long, Long, Long, String, Double, Double, Double, Double, Long)]
      .collect().head
    assert(got._3 == 100L && got._8 == 0.0 && got._9 == 1L)
    // deterministic tie-break: largest key string among the tied max
    assert(got._4 == "u9")
  }

  test("skewReport composes over multi-column keys") {
    val df = Seq(("a", 1), ("a", 1), ("a", 2), ("b", 1)).toDF("x", "y")
    val got = Skew.skewReport(df, Seq("x", "y"))
      .as[(Long, Long, Long, String, Double, Double, Double, Double, Long)]
      .collect().head
    assert(got._2 == 3L && got._3 == 2L && got._4 == "a|1")
  }
}
