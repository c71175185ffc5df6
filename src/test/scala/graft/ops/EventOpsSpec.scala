package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class EventOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("resample: gap buckets appear with zero counts and carry the fill forward") {
    val events = Seq(
      ("a", ts("2026-01-01 10:15:00"), 1.0),
      ("a", ts("2026-01-01 10:45:00"), 2.0),
      // 11:xx missing entirely
      ("a", ts("2026-01-01 12:05:00"), 4.0),
      ("b", ts("2026-01-01 10:30:00"), 7.0))
      .toDF("k", "t", "v")
    val got = EventOps.resample(events, "k", "t", "v", intervalSec = 3600L)
      .orderBy("key", "bucket")
      .as[(String, Timestamp, Long, Option[Double], Option[Double])]
      .collect().toSeq
    val a = got.filter(_._1 == "a")
    assert(a.map(_._2) == Seq(ts("2026-01-01 10:00:00"),
      ts("2026-01-01 11:00:00"), ts("2026-01-01 12:00:00")))
    assert(a.map(_._3) == Seq(2L, 0L, 1L))
    assert(a.map(_._4) == Seq(Some(3.0), None, Some(4.0)))
    assert(a.map(_._5) == Seq(Some(3.0), Some(3.0), Some(4.0))) // gap filled
    assert(got.count(_._1 == "b") == 1) // single-bucket key: no grid blowup
  }

  test("funnel: strict ordering, simultaneous events do not advance") {
    val events = Seq(
      // user 1 completes all three in order
      (1L, ts("2026-01-01 10:00:00"), "signup"),
      (1L, ts("2026-01-01 10:01:00"), "view"),
      (1L, ts("2026-01-01 10:02:00"), "click"),
      // user 2: view BEFORE signup does not count; no view after signup
      (2L, ts("2026-01-01 09:59:00"), "view"),
      (2L, ts("2026-01-01 10:00:00"), "signup"),
      // user 3: click at the SAME instant as view — strict > rejects it
      (3L, ts("2026-01-01 10:00:00"), "signup"),
      (3L, ts("2026-01-01 10:01:00"), "view"),
      (3L, ts("2026-01-01 10:01:00"), "click"),
      // user 4: never signs up
      (4L, ts("2026-01-01 10:00:00"), "click"))
      .toDF("user_id", "t", "typ")
    val got = EventOps.funnel(events, "user_id", "t", "typ",
        steps = Seq("signup", "view", "click"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 2L, 4L -> 0L))
  }

  test("funnel dispatches on the ts column's physical type — ns-long agrees with timestamp") {
    // an UNNORMALIZED ns-epoch long frame (the legacy nanosAsLong read
    // shape): a blind cast("timestamp") would read these as epoch
    // SECONDS (year ~56000) — the dispatch must route them through the
    // ns->us normalization instead, giving the same funnel as the
    // timestamp frame
    val tsed = Seq(
      (1L, ts("2026-01-01 10:00:00"), "signup"),
      (1L, ts("2026-01-01 10:01:00"), "view"),
      (2L, ts("2026-01-01 10:00:00"), "signup"))
      .toDF("user_id", "t", "typ")
    import org.apache.spark.sql.functions.{col, unix_micros}
    val nsLong = tsed.withColumn("t",
      unix_micros(col("t")) * 1000L) // TimestampType -> ns epoch long
    assert(nsLong.schema("t").dataType ==
      org.apache.spark.sql.types.LongType)
    def run(df: org.apache.spark.sql.DataFrame) =
      EventOps.funnel(df, "user_id", "t", "typ", Seq("signup", "view"))
        .as[(Long, Long)].collect().toMap
    assert(run(nsLong) == run(tsed))
    assert(run(nsLong) == Map(1L -> 2L, 2L -> 1L))
  }

  test("cohort retention: offsets count weeks since the cohort's first week") {
    val events = Seq(
      (1L, ts("2026-01-05 10:00:00")), // Mon wk0
      (1L, ts("2026-01-13 10:00:00")), // wk1
      (2L, ts("2026-01-07 10:00:00")), // wk0 cohort, active wk0 only
      (3L, ts("2026-01-13 10:00:00"))) // second cohort
      .toDF("user_id", "t")
    val got = EventOps.cohortRetention(events, "user_id", "t")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(
      ("2026-01-05", 0L, 2L),   // users 1,2 active in their first week
      ("2026-01-05", 1L, 1L),   // user 1 returns
      ("2026-01-12", 0L, 1L)))  // user 3's cohort
  }

  test("transitions: adjacency counts per user order, probabilities per source") {
    val events = Seq(
      (1L, 1L, ts("2026-01-01 10:00:00"), "a"),
      (2L, 1L, ts("2026-01-01 10:01:00"), "b"),
      (3L, 1L, ts("2026-01-01 10:02:00"), "a"),
      (4L, 2L, ts("2026-01-01 10:00:00"), "a"),
      (5L, 2L, ts("2026-01-01 10:01:00"), "c"),
      (6L, 3L, ts("2026-01-01 10:00:00"), "z")) // lone event: no transition
      .toDF("event_id", "user_id", "t", "typ")
    val got = EventOps.transitions(events, "user_id", Seq("t", "event_id"), "typ")
      .as[(String, String, Long, Double)].collect().toSet
    assert(got == Set(
      ("a", "b", 1L, 0.5), ("a", "c", 1L, 0.5), // two a-departures split evenly
      ("b", "a", 1L, 1.0)))
  }

  test("transitions: same-timestamp events order by the tiebreak column") {
    val events = Seq(
      (2L, 1L, ts("2026-01-01 10:00:00"), "b"),
      (1L, 1L, ts("2026-01-01 10:00:00"), "a"))
      .toDF("event_id", "user_id", "t", "typ")
    val got = EventOps.transitions(events, "user_id", Seq("t", "event_id"), "typ")
      .as[(String, String, Long, Double)].collect().toSet
    assert(got == Set(("a", "b", 1L, 1.0)))
  }

  test("topPaths: complete opening paths only, counted and ranked with tiebreak") {
    val events = Seq(
      (1L, 1L, ts("2026-01-01 10:00:00"), "a"),
      (2L, 1L, ts("2026-01-01 10:01:00"), "b"),
      (3L, 2L, ts("2026-01-01 10:00:00"), "a"),
      (4L, 2L, ts("2026-01-01 10:01:00"), "b"),
      (5L, 2L, ts("2026-01-01 10:02:00"), "c"), // only the first 2 count
      (6L, 3L, ts("2026-01-01 10:00:00"), "a")) // incomplete: dropped
      .toDF("event_id", "user_id", "t", "typ")
    val got = EventOps.topPaths(events, "user_id", Seq("t", "event_id"), "typ",
        pathLen = 2, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a > b", 2L)))
  }

  test("topValuesPerColumn: exact counts, per-column k cut, value tiebreak, nulls out") {
    val df = Seq(
      (Some("x"), "p"), (Some("x"), "p"), (Some("y"), "p"),
      (Some("y"), "q"), (None, "q"), (Some("z"), "q"))
      .toDF("c1", "c2")
    val got = Projection.topValuesPerColumn(df, Seq("c1", "c2"), k = 2)
      .orderBy("col_name", "rank")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("c1", "x", 2L, 1L), ("c1", "y", 2L, 2L),   // tie -> value asc
      ("c2", "p", 3L, 1L), ("c2", "q", 3L, 2L)))
  }
}
