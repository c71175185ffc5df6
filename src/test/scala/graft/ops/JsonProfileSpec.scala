package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class JsonProfileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rows = Seq(
    (1L, """{"a": 1, "b": "x"}"""),
    (2L, """{"a": 2}"""),
    (3L, """{"a": 3, "b": "yy", "c": true}"""),
    (4L, """not json at all"""))

  test("keyProfile: per-key doc counts and coverage; malformed rows count in the total") {
    val got = JsonProfile.keyProfile(rows.toDF("id", "js"), "js")
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("a") == ((3L, 0.75)))   // 3 of 4 docs (malformed row dilutes)
    assert(got("b") == ((2L, 0.5)))
    assert(got("c") == ((1L, 0.25)))
    assert(got.size == 3)              // malformed contributes no keys
  }

  test("fieldStats: presence and mean extracted length per requested key") {
    val got = JsonProfile.fieldStats(rows.toDF("id", "js"), "js", Seq("a", "b", "zz"))
      .as[(String, Long, Option[Double])].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("a")._1 == 3L)
    assert(got("b") == ((2L, Some(1.5)))) // "x" (1) and "yy" (2)
    assert(got("zz") == ((0L, None)))     // requested but absent everywhere
  }

  test("requireKeys: admission predicate, malformed JSON never passes") {
    val got = rows.toDF("id", "js")
      .select($"id", JsonProfile.requireKeys($"js", Seq("a", "b")).as("ok"))
      .as[(Long, Option[Boolean])].collect().toMap
    assert(got(1L).contains(true) && got(3L).contains(true))
    assert(got(2L).contains(false))
    assert(!got(4L).contains(true))    // malformed -> null/false, not a throw
  }

  test("keyProfile's aggregate key space is the schema width, not the corpus") {
    val wide = (1L to 500L).map(i => (i, s"""{"k${i % 7}": $i}""")).toDF("id", "js")
    val prof = JsonProfile.keyProfile(wide, "js")
    assert(prof.count() == 7)
    val plan = prof.queryExecution.executedPlan.toString
    assert(!plan.contains("SortAggregate"), plan)
  }

  test("keyProfile reads the corpus exactly once (numerator and denominator share a snapshot)") {
    // a non-deterministic source must not produce coverage > 1.0; the
    // guarantee is structural — one Generate (one explode of one scan)
    // feeds both the per-key counts and the document total
    val prof = JsonProfile.keyProfile(rows.toDF("id", "js"), "js")
    val plan = prof.queryExecution.executedPlan.toString
    val nGenerates = "Generate".r.findAllIn(plan).length
    assert(nGenerates == 1, plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan)
    // empty-object docs count in the denominator too
    import spark.implicits._
    val withEmpty = (rows :+ ((5L, "{}"))).toDF("id", "js")
    val got = JsonProfile.keyProfile(withEmpty, "js")
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("a") == ((3L, 0.6)))   // 3 of 5 docs now
  }
}
