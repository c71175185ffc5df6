package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic event-stream analytics over an (id, ts, user, type, value)
  * table — the reporting layer a telemetry corpus feeds: fixed-grid
  * resampling (gap-filled time series), ordered funnels, and cohort
  * retention. All three are single-shuffle shapes: one aggregation on
  * the user/key, windows inside the same partitioning.
  */
object EventOps {

  /** Fixed-interval resample per key: bucket events into `intervalSec`
    * buckets, then materialize EVERY bucket between each key's first and
    * last event — gap buckets carry n_events = 0, null sum_value, and a
    * forward-filled `filled_value` (last non-null bucket sum). The
    * gap-visible time series a monitoring dashboard draws.
    *
    * One aggregation on (key, bucket); the per-key grid comes from
    * `sequence()` on the key's own bounds (an agg + a projection — no
    * driver loop, no cross join against a global calendar); the ffill
    * window rides the same key partitioning. Grids are per-key-span
    * bounded — a key alive for a day at 1 h buckets explodes to 24 rows,
    * never the corpus-wide span. */
  def resample(events: DataFrame, keyCol: String, tsCol: String,
               valueCol: String, intervalSec: Long = 3600L): DataFrame = {
    require(intervalSec > 0, s"resample: intervalSec must be > 0, got $intervalSec")
    val bucket = timestamp_seconds(
      floor(unix_timestamp(col(tsCol)) / intervalSec) * intervalSec)
    val agg = events
      .select(col(keyCol).as("key"), bucket.as("bucket"),
        col(valueCol).as("v"))
      .groupBy(col("key"), col("bucket"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("v")), 2).as("sum_value"))
    val grid = agg.groupBy(col("key"))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col("key"), explode(expr(
        s"sequence(b0, b1, interval $intervalSec seconds)")).as("bucket"))
    val joined = grid.join(agg, Seq("key", "bucket"), "left")
    val w = Window.partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .withColumn("filled_value",
        last(col("sum_value"), ignoreNulls = true).over(w))
      .select(col("key"), col("bucket"), col("n_events"),
        col("sum_value"), col("filled_value"))
  }

  /** Ordered funnel: how far each user progresses through `steps`, where
    * each step must occur STRICTLY after the previous one in event time
    * (simultaneous events do not advance — ties are not ordered
    * progress). Output: (user, steps_completed).
    *
    * One shuffle on the user, then a per-user fold over the time-sorted
    * event list — NOT `steps.length` self-joins (each a full shuffle) as
    * the naive SQL writes it; the oracle does run that chained-join form
    * to gate this fold. Per-user event lists must be group-bounded (the
    * sessionization assumption); only (ts, type) pairs are collected. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel: steps must be non-empty")
    val stepArr = array(steps.map(lit): _*)
    // normalize dispatches on the column's physical type (ns-long ->
    // micros, NTZ -> timestamp); after it, unix_micros either sees
    // TimestampType or fails analysis loudly — no silent
    // seconds-vs-nanos misread for callers that skipped normalization
    graft.streaming.StreamOps.normalize(events, tsCol)
      .select(col(userCol).as("user"),
        unix_micros(col(tsCol)).as("t"), col(typeCol).as("typ"))
      .groupBy(col("user"))
      .agg(sort_array(collect_list(struct(col("t"), col("typ")))).as("evs"))
      .withColumn("state", aggregate(
        col("evs"),
        struct(lit(0).as("step"), lit(Long.MinValue).as("last")),
        (st, e) => {
          // least() clamp: once step == steps.length the comparison arm is
          // dead (step < length is false) but element_at must still see a
          // VALID index — an out-of-range literal index throws under ANSI
          val nextStep = element_at(stepArr,
            least(st.getField("step") + 1, lit(steps.length)))
          val advance = st.getField("step") < lit(steps.length) &&
            e.getField("typ") === nextStep &&
            e.getField("t") > st.getField("last")
          struct(
            when(advance, st.getField("step") + 1)
              .otherwise(st.getField("step")).as("step"),
            when(advance, e.getField("t"))
              .otherwise(st.getField("last")).as("last"))
        }))
      .select(col("user"),
        col("state.step").cast("long").as("steps_completed"))
  }

  /** Rolling z-score anomaly detection: for each row, mean/variance of
    * the PRIOR `lookback` values within the key (rows-frame window), and
    * the z-score of the current value against that trailing baseline —
    * the self-calibrating spike detector a telemetry pipeline runs per
    * device/user. Rows with fewer than `minPoints` priors or zero
    * trailing variance carry a null z (no baseline, no verdict).
    *
    * One shuffle on the key; all three window aggregates (count, sum,
    * sum-of-squares) ride a single rows-bounded running frame — no
    * per-row rescans, state is O(lookback) per key. Variance comes from
    * the moment sums, not stddev_samp, so an integer-valued input column
    * (e.g. cents) keeps every intermediate EXACT until the final double
    * division — bit-identical across engines, which is what lets the
    * DuckDB oracle hash-match a floating-point anomaly score. */
  def rollingZScore(events: DataFrame, keyCol: String, orderCols: Seq[String],
                    valueCol: String, lookback: Int = 20,
                    minPoints: Int = 10): DataFrame = {
    require(lookback >= minPoints && minPoints >= 2,
      s"rollingZScore: need lookback >= minPoints >= 2, got $lookback/$minPoints")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-lookback, -1)
    val v = col(valueCol)
    val cnt = count(v).over(w)
    val s = sum(v).over(w).cast("double")
    val s2 = sum(v * v).over(w).cast("double")
    val variance = (s2 - s * s / cnt) / (cnt - lit(1))
    val z = (v - s / cnt) / sqrt(variance)
    events
      .withColumn("n_prior", cnt)
      .withColumn("z",
        when(cnt >= minPoints && variance > lit(0.0), z))
  }

  /** Weekly cohort retention: users grouped by the ISO week of their
    * first event; for each (cohort_week, week_offset) the number of
    * cohort members active in that week. The triangle a growth dashboard
    * renders. Two aggregations (first-event per user, then the distinct
    * (user, week) activity grid joined back on the user) — both keyed on
    * the user, one broadcast-sized output. */
  def cohortRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val weeks = events.select(col(userCol).as("user"),
      date_trunc("week", col(tsCol)).as("week"))
    val cohorts = weeks.groupBy(col("user"))
      .agg(min(col("week")).as("cohort_week"))
    weeks.distinct()
      .join(cohorts, "user")
      .withColumn("week_offset",
        (datediff(col("week"), col("cohort_week")) / 7).cast("long"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user")).as("n_users"))
      .select(date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_users"))
  }

  /** First-order Markov transition matrix over event types: for every
    * observed (from_type, to_type) adjacency within a key's ordered
    * stream, the transition count and the probability conditioned on the
    * source type. The "what do users do next" table behind flow
    * diagrams and next-action models.
    *
    * One shuffle on the key; `lead` is a streaming window over that same
    * partitioning, and the (from, to) aggregation that follows is
    * type-domain sized (tiny), as is the per-source normalisation — the
    * corpus is touched once. Last event of each key has no successor and
    * drops out (no synthetic END state; callers wanting one can append
    * it to the input). */
  def transitions(events: DataFrame, keyCol: String, orderCols: Seq[String],
                  typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val counts = events
      .withColumn("to_type", lead(col(typeCol), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val w2 = Window.partitionBy(col("from_type"))
    counts
      .withColumn("p", round(col("n") / sum(col("n")).over(w2), 4))
      .select(col("from_type"), col("to_type"), col("n"), col("p"))
  }

  /** Top-k most frequent consecutive `n`-step paths ANYWHERE in a key's
    * stream (not just the opening — see [[topPaths]] for that): every
    * sliding window of `n` adjacent event types, counted corpus-wide.
    * The "what sequences actually happen" mining pass behind flow
    * optimization.
    *
    * One shuffle on the key; the n `lead` columns share a single window
    * (one sort, streaming frame), incomplete tail windows drop via the
    * null check, and the count aggregation shrinks to the distinct-path
    * domain (bounded by |types|^n, not corpus size). */
  def pathNgrams(events: DataFrame, keyCol: String, orderCols: Seq[String],
                 typeCol: String, n: Int = 3, k: Int = 15): DataFrame = {
    require(n >= 1 && k >= 1, s"pathNgrams: need n/k >= 1, got $n/$k")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val steps = array((0 until n).map(i => lead(col(typeCol), i).over(w)): _*)
    events
      .withColumn("__steps", steps)
      .where(forall(col("__steps"), s => s.isNotNull))
      .select(array_join(col("__steps"), " > ").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_windows"))
      .orderBy(col("n_windows").desc, col("path"))
      .limit(k)
  }

  /** Top-k most common opening paths: each key's first `pathLen` event
    * types joined with " > ", counted across keys — the entry-flow
    * report ("what are the first three things users do"). Ordering
    * within a key must be total (pass a tiebreak column alongside the
    * timestamp) or the path strings are not reproducible.
    *
    * One shuffle on the key; the rank-and-truncate runs inside that
    * partitioning (row_number + filter, no per-key buffering beyond the
    * window frame), and the path aggregation shrinks to the distinct-path
    * domain before the final top-k. */
  def topPaths(events: DataFrame, keyCol: String, orderCols: Seq[String],
               typeCol: String, pathLen: Int = 3, k: Int = 10): DataFrame = {
    require(pathLen >= 1 && k >= 1, s"topPaths: need pathLen/k >= 1, got $pathLen/$k")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    events
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= pathLen)
      .groupBy(col(keyCol))
      // collect in rank order: sort the (rn, type) structs, then project
      .agg(array_sort(collect_list(struct(col("__rn"), col(typeCol).as("t"))))
        .as("steps"))
      .where(size(col("steps")) === pathLen) // complete paths only
      .select(array_join(expr("transform(steps, s -> s.t)"), " > ").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_keys"))
      .orderBy(col("n_keys").desc, col("path"))
      .limit(k)
  }
}
