package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class AsOfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val left = Seq(
    (1L, "u", ts("2026-01-10 00:00:00")),
    (2L, "u", ts("2026-01-20 00:00:00")),
    (3L, "v", ts("2026-01-05 00:00:00")),  // before any right row for v
    (4L, "w", ts("2026-01-10 00:00:00")))  // key with no right rows
    .toDF("eid", "k", "t")

  private lazy val right = Seq(
    ("u", ts("2026-01-01 00:00:00"), 100L),
    ("u", ts("2026-01-15 00:00:00"), 101L),
    ("v", ts("2026-01-08 00:00:00"), 200L))
    .toDF("k2", "rt", "version")

  test("as-of join picks the latest right row at or before left time") {
    val got = AsOf.join(left, right, "k", "k2", "t", "rt", Seq("eid"),
        rightTiebreak = Seq("version"))
      .select("eid", "version").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got == Map(
      1L -> Some(100L),  // 01-15 is after 01-10 -> falls back to 01-01
      2L -> Some(101L),  // latest <= 01-20
      3L -> None,        // only future right rows
      4L -> None))       // no right rows at all
  }

  test("tolerance bounds how stale the match may be") {
    val got = AsOf.join(left, right, "k", "k2", "t", "rt", Seq("eid"),
        rightTiebreak = Seq("version"),
        tolerance = Some(expr("INTERVAL 6 DAYS")))
      .select("eid", "version").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    // eid 1: only match is 9 days stale -> dropped; eid 2: 5 days -> kept
    assert(got(1L).isEmpty && got(2L).contains(101L))
  }

  test("custom sort-merge plan agrees with the composed form") {
    // long keys (the primitive fast path)
    val l = Seq((1L, 10L, ts("2026-01-10 00:00:00")),
      (2L, 10L, ts("2026-01-20 00:00:00")),
      (3L, 20L, ts("2026-01-05 00:00:00")),
      (4L, 30L, ts("2026-01-10 00:00:00")))
      .toDF("eid", "k", "t")
    val r = Seq((10L, ts("2026-01-01 00:00:00"), 100L),
      (10L, ts("2026-01-15 00:00:00"), 101L),
      (20L, ts("2026-01-08 00:00:00"), 200L))
      .toDF("k2", "rt", "version")
    def collectPairs(df: org.apache.spark.sql.DataFrame) =
      df.select("eid", "version").collect()
        .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    val composed = collectPairs(
      AsOf.join(l, r, "k", "k2", "t", "rt", Seq("eid"), Seq("version")))
    val custom = collectPairs(
      AsOf.joinExact(l, r, "k", "k2", "t", "rt", Some("version")))
    assert(custom == composed)
    assert(custom == Map(1L -> 100L, 2L -> 101L, 3L -> -1L, 4L -> -1L))
  }

  test("custom plan agrees with the composed form on the events/orders tables") {
    val spark2 = spark
    val ev = graft.streaming.StreamOps.normalize(
      spark2.read.parquet("/root/testdata/sf0.001/events.parquet"))
    val o = spark2.read.parquet("/root/testdata/sf0.001/orders.parquet")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "o_orderkey").collect()
        .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
    val composed = norm(AsOf.join(ev, o, "user_id", "o_custkey", "ts",
      "o_orderdate", Seq("event_id"), Seq("o_orderkey")))
    val custom = norm(AsOf.joinExact(ev, o, "user_id", "o_custkey", "ts",
      "o_orderdate", Some("o_orderkey")))
    assert(custom == composed)
    assert(custom.size == 1000)
  }

  test("custom plan handles string keys and int times") {
    // generalized type dispatch: string key compare + int time compare
    val l = Seq(("ua", 10, 1L), ("ua", 20, 2L), ("vb", 5, 3L), ("wc", 10, 4L))
      .toDF("k", "t", "eid")
    val r = Seq(("ua", 1, 100L), ("ua", 15, 101L), ("vb", 8, 200L))
      .toDF("k2", "rt", "version")
    val got = AsOf.joinExact(l, r, "k", "k2", "t", "rt", Some("version"))
      .select("eid", "version").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    assert(got == Map(1L -> 100L, 2L -> 101L, 3L -> -1L, 4L -> -1L))
  }

  test("custom plan's declared output partitioning is reused downstream") {
    val l = Seq((1L, 10L, ts("2026-01-10 00:00:00")),
      (2L, 10L, ts("2026-01-20 00:00:00")),
      (3L, 20L, ts("2026-01-05 00:00:00")))
      .toDF("eid", "k", "t")
    val r = Seq((10L, ts("2026-01-01 00:00:00"), 100L))
      .toDF("k2", "rt", "version")
    // a groupBy on the join key directly after the custom plan must ride
    // the join's hash-clustering: exactly the two child exchanges, none
    // added for the aggregation
    val q = AsOf.joinExact(l, r, "k", "k2", "t", "rt", None)
      .groupBy("k").count()
    q.collect()
    // AQE prints Final and Initial sections — count the final plan only
    val full = q.queryExecution.executedPlan.toString
    val plan = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i => full.substring(0, i)
    }
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 child exchanges, got $exchanges:\n${plan.take(1500)}")
    // and the aggregate sits directly on the join (same codegen stage side)
    assert(plan.contains("AsOfJoin"), plan.take(1500))
  }

  test("custom plan rejects mismatched key types with a clear error") {
    val l = Seq((1L, 10, 1L)).toDF("k", "t", "eid")
    val r = Seq(("10", 1, 100L)).toDF("k2", "rt", "version")
    val e = intercept[Exception] {
      AsOf.joinExact(l, r, "k", "k2", "t", "rt", None).collect()
    }
    assert(e.getMessage != null)
  }

  test("custom plan rejects a raw long time against a timestamp time") {
    // LongType used to be lumped into the timestamp family: a long in
    // arbitrary units (epoch millis, sequence numbers) would silently
    // merge-join against micros-as-long timestamps with wrong matches.
    // Only TIMESTAMP vs TIMESTAMP_NTZ share representation AND unit.
    val l = Seq((10L, 5L, 1L)).toDF("k", "t", "eid")
    val r = Seq((10L, ts("2026-01-01 00:00:00"), 100L)).toDF("k2", "rt", "version")
    val e = intercept[Exception] {
      AsOf.joinExact(l, r, "k", "k2", "t", "rt", None).collect()
    }
    assert(e.getMessage.contains("as-of time types differ"), e.getMessage)
  }

  test("exact tie on right time resolved by the tiebreak column") {
    val r2 = Seq(("u", ts("2026-01-01 00:00:00"), 1L),
      ("u", ts("2026-01-01 00:00:00"), 2L)).toDF("k2", "rt", "version")
    val got = AsOf.join(left.where($"eid" === 1), r2, "k", "k2", "t", "rt",
        Seq("eid"), rightTiebreak = Seq("version"))
      .select("version").as[Long].head()
    assert(got == 2L)
  }
}
