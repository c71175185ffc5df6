package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** k-anonymity / l-diversity audits and the generalization ladder. */
class PrivacySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def people = Seq(
    // (zip, age, disease)
    ("13053", 28, "heart"), ("13053", 29, "heart"), ("13053", 21, "flu"),
    ("13068", 21, "flu"), ("13068", 22, "flu"), ("13068", 23, "flu"),
    ("14850", 50, "cancer")
  ).toDF("zip", "age", "disease")

  test("kAnonymity flags classes smaller than k") {
    val got = Privacy.kAnonymity(people,
      Seq("zip" -> col("zip")), k = 3)
      .as[(String, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got("13053") == (("13053", 3L, false)))
    assert(got("13068") == (("13068", 3L, false)))
    assert(got("14850") == (("14850", 1L, true)))
  }

  test("kAnonymityReport aggregates the risk share") {
    val got = Privacy.kAnonymityReport(people,
      Seq("zip" -> col("zip")), k = 3)
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(got == ((7L, 3L, 1L, 1L, 0.1429)))
  }

  test("generalization raises the achieved k") {
    // zip prefix 3 merges 13053 + 13068 into one 6-row class
    val got = Privacy.kAnonymityReport(people,
      Seq("zip3" -> Privacy.generalizePrefix(col("zip"), 3)), k = 3)
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(got._2 == 2L && got._3 == 1L) // still the lone 148 row
    val coarse = Privacy.kAnonymityReport(people,
      Seq("zip1" -> Privacy.generalizePrefix(col("zip"), 1)), k = 3)
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(coarse == ((7L, 1L, 7L, 0L, 0.0)))
  }

  test("generalizeNum buckets by fixed width including negatives") {
    val got = Seq(-1500.0, -1.0, 0.0, 999.0, 1000.0)
      .toDF("v").select(Privacy.generalizeNum(col("v"), 1000.0).as("b"))
      .as[Double].collect().toSeq
    assert(got == Seq(-2000.0, -1000.0, 0.0, 0.0, 1000.0))
  }

  test("lDiversity catches the k-anonymous but sensitive-constant class") {
    val got = Privacy.lDiversity(people,
      Seq("zip" -> col("zip")), "disease", l = 2)
      .as[(String, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got("13053") == (("13053", 3L, 2L, false)))
    // 13068 is 3-anonymous yet everyone has the flu -> violates l=2
    assert(got("13068") == (("13068", 3L, 1L, true)))
    assert(got("14850")._4)
  }

  test("tCloseness measures class distribution drift from the global one") {
    // global disease dist: flu 4/7, heart 2/7, cancer 1/7
    val got = Privacy.tCloseness(people,
      Seq("zip" -> col("zip")), "disease", t = 0.3)
      .as[(String, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // 13068 is all-flu: tv = 0.5*(|1-4/7| + 2/7 + 1/7) = 3/7
    assert(got("13068")._3 == BigDecimal(3.0 / 7)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got("13068")._4)
    // 13053: flu 1/3 heart 2/3 -> tv = 0.5*(|1/3-4/7| + |2/3-2/7| + 1/7)
    val tv = 0.5 * (math.abs(1.0 / 3 - 4.0 / 7) +
      math.abs(2.0 / 3 - 2.0 / 7) + 1.0 / 7)
    assert(got("13053")._3 == BigDecimal(tv)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // a class mirroring the global distribution scores 0
    val uniform = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("zip", "disease")
    val z = Privacy.tCloseness(uniform, Seq("zip" -> col("zip")),
      "disease", t = 0.3).as[(String, Long, Double, Boolean)].collect()
    assert(z.forall(r => r._3 == 0.0 && !r._4))
  }

  test("tCloseness keeps NULL quasi classes and NULL sensitive values (triad-consistent)") {
    // one class with a NULL zip, one row with a NULL disease: both must
    // appear in the audit exactly as kAnonymity/lDiversity's groupBy
    // would keep them, and the NULL-disease row must count in both the
    // class and the global distribution.
    val df = Seq(
      (Some("13053"), Some("heart")), (Some("13053"), Some("heart")),
      (None: Option[String], Some("flu")), (None: Option[String], None: Option[String]))
      .toDF("zip", "disease")
    val got = Privacy.tCloseness(df, Seq("zip" -> col("zip")),
      "disease", t = 0.3)
      .collect().map(r => Option(r.getString(0)) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(Some("13053"), None),
      "NULL-zip class must be audited, not dropped")
    assert(got(None)._1 == 2L,
      "NULL-disease row must count in its class size")
    // global: heart 1/2, flu 1/4, null 1/4.
    // 13053 class (all heart): tv = 0.5*(|1-1/2| + 1/4 + 1/4) = 0.5
    assert(got(Some("13053"))._2 == 0.5)
    // null-zip class (flu 1/2, null 1/2): tv = 0.5*(1/2 + |1/2-1/4| + |1/2-1/4|) = 0.5
    assert(got(None)._2 == 0.5)
  }

  test("tCloseness's audit plan carries the global distribution as literal rows, not a re-scan") {
    // regression for the extra df.count() corpus scan: the global
    // value distribution (and the grand total folded into __p) must be
    // pre-collected once and enter the audit plan as a LocalRelation —
    // the optimized plan must contain no __nv aggregate branch.
    val plan = Privacy.tCloseness(people, Seq("zip" -> col("zip")),
      "disease", t = 0.3).queryExecution.optimizedPlan.toString
    assert(!plan.contains("__nv"),
      "global distribution must be pre-collected, not re-aggregated in the audit plan")
    assert(plan.contains("__p"), "broadcast side must carry the literal shares")
  }

  test("anonymityLadder emits one report row per level, risk falling") {
    val got = Privacy.anonymityLadder(people, Seq(
      "fine" -> Seq("zip" -> col("zip"), "age" -> col("age")),
      "mid" -> Seq("zip" -> col("zip")),
      "coarse" -> Seq("zip1" -> Privacy.generalizePrefix(col("zip"), 1))),
      k = 3)
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size == 3)
    assert(got("fine")._6 == 1.0)    // every (zip, age) class is tiny
    assert(got("mid")._6 == 0.1429)
    assert(got("coarse")._6 == 0.0)
  }
}
