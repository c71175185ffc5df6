package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class StatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("correlationMatrix: perfect +/- correlations and the long-form pair set") {
    val df = Seq((1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0))
      .toDF("a", "b", "c")
    val got = Stats.correlationMatrix(df, Seq("a", "b", "c"))
      .as[(String, String, Double)].collect().toSet
    assert(got == Set(
      ("a", "b", 1.0), ("a", "c", -1.0), ("b", "c", -1.0)))
  }

  test("correlationMatrix: single aggregation — no shuffle beyond the global agg") {
    val df = spark.range(10000).selectExpr(
      "CAST(id AS DOUBLE) AS a", "CAST(id % 97 AS DOUBLE) AS b",
      "CAST(id % 89 AS DOUBLE) AS c")
    val q = Stats.correlationMatrix(df, Seq("a", "b", "c"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // global agg plans a SinglePartition exchange; no hashpartitioning
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(1200))
  }

  test("groupedTrend: recovers slope/intercept of exact linear groups") {
    val df = (0 until 50).flatMap { i =>
      Seq(("up", i.toDouble, 2.0 * i + 5.0), ("flat", i.toDouble, 7.0))
    }.toDF("g", "x", "y")
    val got = Stats.groupedTrend(df, Seq("g"), "x", "y")
      .as[(String, Double, Double, Option[Double], Long)].collect()
      .map { case (g, s, i, r2, n) => g -> ((s, i, r2, n)) }.toMap
    assert(got("up") == ((2.0, 5.0, Some(1.0), 50L)))
    // zero-variance y: slope 0, r2 is NaN-ish per SQL standard -> Spark
    // yields 0.0 slope and r2 1.0 or null depending on the form; assert
    // the stable parts
    assert(got("flat")._1 == 0.0 && got("flat")._4 == 50L)
  }
}
