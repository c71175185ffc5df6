package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def big = (0L until 5000L).map(i => (i, i % 500)).toDF("row_id", "k")
  private def small = (0L until 50L).map(i => (i * 7, s"v$i")).toDF("sk", "tag")

  test("semiJoin equals the plain left_semi join") {
    val got = BloomJoin.semiJoin(big, small, "k", "sk")
      .select("row_id").as[Long].collect().toSet
    val want = big.join(small, $"k" === $"sk", "left_semi")
      .select("row_id").as[Long].collect().toSet
    assert(got == want && want.nonEmpty)
  }

  test("antiJoin equals the plain left_anti join") {
    val got = BloomJoin.antiJoin(big, small, "k", "sk")
      .select("row_id").as[Long].collect().toSet
    val want = big.join(small, $"k" === $"sk", "left_anti")
      .select("row_id").as[Long].collect().toSet
    assert(got == want && want.nonEmpty)
    // and the two partitions of big are disjoint + complete
    assert(got.size + BloomJoin.semiJoin(big, small, "k", "sk").count() == 5000L)
  }

  test("null keys: semi drops them, anti keeps them (SQL equality semantics)") {
    val b = Seq[(java.lang.Long, java.lang.Long)]((1L, 10L), (2L, null), (3L, 999L))
      .toDF("row_id", "k")
    val s = Seq[(java.lang.Long, String)]((10L, "x"), (null, "n")).toDF("sk", "tag")
    assert(BloomJoin.semiJoin(b, s, "k", "sk")
      .select("row_id").as[Long].collect().toSet == Set(1L))
    assert(BloomJoin.antiJoin(b, s, "k", "sk")
      .select("row_id").as[Long].collect().toSet == Set(2L, 3L))
  }

  test("empty reference side: semi is empty, anti is everything") {
    val none = small.where(lit(false))
    assert(BloomJoin.semiJoin(big, none, "k", "sk").count() == 0L)
    assert(BloomJoin.antiJoin(big, none, "k", "sk").count() == 5000L)
  }

  test("the prefilter actually prunes: non-members rarely reach the exact join") {
    // keys 0..499 in big; small holds multiples of 7 only (72 member keys)
    val bloom = BloomJoin.bloomBytes(small, "sk", expectedItems = 72, fpp = 0.01)
    val survivors = big.where(BloomJoin.mightContain(bloom, col("k"))).count()
    val members = big.join(small, $"k" === $"sk", "left_semi").count()
    // survivors = members + false positives; at fpp=1% on 500 distinct keys
    // the FP margin should stay far below the pruned mass
    assert(survivors >= members, s"bloom lost members: $survivors < $members")
    assert(survivors <= members + 500, s"prefilter pruned nothing: $survivors")
  }

  test("might_contain runs against the corpus scan in the executed plan") {
    // spark.range keeps a real scan in the plan (a LocalRelation would be
    // collapsed by ConvertToLocalRelation, folding the filter away)
    val rangeBig = spark.range(5000).select(col("id").as("row_id"),
      pmod(col("id"), lit(500)).as("k"))
    val q = BloomJoin.semiJoin(rangeBig, small, "k", "sk")
    q.count()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(1200))
  }

  test("mismatched key types are refused, not silently degraded") {
    val intSmall = Seq((7, "a")).toDF("sk", "tag")
    val e = intercept[IllegalArgumentException] {
      BloomJoin.semiJoin(big, intSmall, "k", "sk")
    }
    assert(e.getMessage.contains("key types"))
  }
}
