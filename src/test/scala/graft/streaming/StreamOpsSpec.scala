package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Structured Streaming smoke: the streaming pipeline over the driver's
  * events parquet must agree with the batch form of the same transform. */
class StreamOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // FileStreamSource needs a directory; stage the driver's events file
  private lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_stream_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("streamed windowed counts equal the batch computation") {
    val batch = StreamOps.windowedCounts(
      StreamOps.normalize(spark.read.parquet(s"$streamDir/events.parquet")))
    val expected = batch.count()

    val stream = StreamOps.windowedCounts(
      StreamOps.readEventsStream(spark, streamDir))
    // complete mode: emit full aggregation state each trigger (append would
    // hold rows until the watermark passes, which never happens on a
    // finite file stream)
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("win_counts").start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_counts").count()
      assert(got == expected)
      assert(expected > 0)
    } finally q.stop()
  }

  test("readEventsStream on an empty directory falls back to eventsSchema") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_empty_")
    // schema inference has nothing to read — the imposed eventsSchema
    // keeps the stream startable before the first file lands
    val stream = StreamOps.readEventsStream(spark, dir.toString)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType) // normalized from the fallback's ns-long
    val q = StreamOps.windowedCounts(stream).writeStream
      .outputMode("complete").format("memory").queryName("empty_dir_win").start()
    try {
      q.processAllAvailable()
      assert(spark.table("empty_dir_win").count() == 0)
      // a file landing AFTER stream start (the fallback's ns-long
      // encoding) is picked up and aggregated
      val tsed = Seq((1L, 1767261600000000000L, 7L, "click", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      tsed.coalesce(1).write.mode("append").parquet(dir.toString)
      q.processAllAvailable()
      assert(spark.table("empty_dir_win").count() == 1)
    } finally q.stop()
  }

  test("watermarked interval stream-stream join equals the batch join") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val batch = StreamOps.normalize(spark.read.parquet(s"$streamDir/events.parquet"))
    val expected = StreamOps.intervalJoinStream(
        batch.where(col("event_type") === "click"),
        batch.where(col("event_type") === "purchase"),
        maxDelayMs = 30 * 60 * 1000L)
      .as[(Long, Long)].collect().toSet

    val s1 = StreamOps.readEventsStream(spark, streamDir)
    val s2 = StreamOps.readEventsStream(spark, streamDir)
    val joined = StreamOps.intervalJoinStream(
      s1.where(col("event_type") === "click"),
      s2.where(col("event_type") === "purchase"),
      maxDelayMs = 30 * 60 * 1000L)
    // inner stream-stream joins emit matches eagerly — append mode works
    // on a finite source; the watermark only bounds buffered state
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("interval_join").start()
    try {
      q.processAllAvailable()
      val got = spark.table("interval_join").as[(Long, Long)].collect().toSet
      assert(got == expected)
      assert(expected.nonEmpty)
    } finally q.stop()
  }

  test("outer interval join: unmatched lefts emit with nulls AFTER the watermark proves no match") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_outer_ij_")
    def writeBatch(name: String, rows: Seq[(Long, java.sql.Timestamp, Long, String)]): Unit = {
      val staging = dir.resolve(s"_stg_$name")
      rows.toDF("event_id", "ts", "user_id", "event_type")
        .coalesce(1).write.parquet(staging.toString)
      val part = java.nio.file.Files.list(staging)
        .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(part, dir.resolve(s"$name.parquet"))
    }
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // batch 1: click 1 (user 1) has a purchase in-window; click 2 (user 2) never will
    writeBatch("b1", Seq(
      (10L, ts("2026-01-01 10:00:00"), 1L, "click"),
      (11L, ts("2026-01-01 10:10:00"), 1L, "purchase"),
      (20L, ts("2026-01-01 10:00:00"), 2L, "click")))
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("ts", TimestampType), StructField("user_id", LongType),
      StructField("event_type", StringType)))
    def src = spark.readStream.schema(schema).parquet(dir.toString)
    val joined = StreamOps.intervalJoinOuterStream(
      src.where($"event_type" === "click"),
      src.where($"event_type" === "purchase"),
      maxDelayMs = 30 * 60 * 1000L, watermark = "10 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("outer_ij").start()
    try {
      q.processAllAvailable()
      val afterB1 = spark.table("outer_ij")
        .as[(Long, Option[Long])].collect().toSet
      // the match emits eagerly; the unmatched click is still HELD — the
      // watermark hasn't proven a purchase can't arrive
      assert(afterB1 == Set((10L, Some(11L))))
      // batch 2: far-future events on BOTH sides — the global watermark is
      // the MIN of the per-stream watermarks, and each side's watermark
      // only advances on rows that survive that side's filter; a lone
      // purchase would leave the click-side watermark at 10:00 forever.
      // Click 98 itself stays held (nothing ever outlives ITS deadline).
      writeBatch("b2", Seq(
        (98L, ts("2026-01-02 00:00:00"), 8L, "click"),
        (99L, ts("2026-01-02 00:00:00"), 9L, "purchase")))
      q.processAllAvailable()
      q.processAllAvailable() // one extra cycle: watermark advances a batch late
      val afterB2 = spark.table("outer_ij")
        .as[(Long, Option[Long])].collect().toSet
      assert(afterB2 == Set((10L, Some(11L)), (20L, None)))
    } finally q.stop()
  }

  test("streaming funnel: completion emits eagerly, drop-off at the event-time deadline") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel_")
    def writeBatch(name: String, rows: Seq[(Long, java.sql.Timestamp, Long, String)]): Unit = {
      val staging = dir.resolve(s"_stg_$name")
      rows.toDF("event_id", "ts", "user_id", "event_type")
        .coalesce(1).write.parquet(staging.toString)
      val part = java.nio.file.Files.list(staging)
        .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(part, dir.resolve(s"$name.parquet"))
    }
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1 completes inside the span; user 2 stalls after signup+view
    writeBatch("b1", Seq(
      (1L, ts("2026-01-01 10:00:00"), 1L, "signup"),
      (2L, ts("2026-01-01 10:05:00"), 1L, "view"),
      (3L, ts("2026-01-01 10:10:00"), 1L, "click"),
      (4L, ts("2026-01-01 10:00:00"), 2L, "signup"),
      (5L, ts("2026-01-01 10:02:00"), 2L, "view")))
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("ts", TimestampType), StructField("user_id", LongType),
      StructField("event_type", StringType)))
    val q = StreamOps.funnelStream(
        spark.readStream.schema(schema).parquet(dir.toString),
        Seq("signup", "view", "click"),
        maxSpanMs = 30 * 60 * 1000L, watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_stream").start()
    try {
      q.processAllAvailable()
      val afterB1 = spark.table("funnel_stream")
        .as[(Long, Boolean, Long)].collect().toSet
      assert(afterB1 == Set((1L, true, 3L))) // user 2 still inside its window
      // a far-future event (user 9 starts its own funnel) drags the
      // watermark past user 2's deadline -> drop-off row with progress
      writeBatch("b2", Seq((99L, ts("2026-01-02 00:00:00"), 9L, "signup")))
      q.processAllAvailable()
      q.processAllAvailable() // watermark advances a batch late
      val afterB2 = spark.table("funnel_stream")
        .as[(Long, Boolean, Long)].collect().toSet
      assert(afterB2 == Set((1L, true, 3L), (2L, false, 2L)))
    } finally q.stop()
  }

  test("stateful sessionization closes sessions at the gap, keeps state per user") {
    import spark.implicits._
    val events = Seq(
      // user 1: two sessions separated by a 2h gap
      (1L, "2026-01-01 10:00:00", 1.0), (1L, "2026-01-01 10:10:00", 2.0),
      (1L, "2026-01-01 13:00:00", 3.0),
      // user 2: one session, stays open (never emitted in append mode)
      (2L, "2026-01-01 10:00:00", 5.0))
      .toDF("user_id", "ts_s", "value")
      .withColumn("ts", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("ts_s")))
    val sessions = StreamOps.sessionize(events, gapMs = 30 * 60 * 1000L)
    // batch Datasets run flatMapGroupsWithState eagerly (no stream needed)
    val closed = sessions.collect()
    assert(closed.length == 1)
    val s = closed.head
    assert(s.user_id == 1L && s.n_events == 2 && s.sum_value == 3.0)
    assert(s.session_start.toString.startsWith("2026-01-01 10:00:00"))
    assert(s.session_end.toString.startsWith("2026-01-01 10:10:00"))
  }

  test("batch gaps-and-islands sessionization agrees with the stateful form") {
    // real events slice: both implementations must close identical sessions
    val events = StreamOps.normalize(spark.read.parquet(s"$streamDir/events.parquet"))
    // compare at second precision (as the oracle does): the stateful path
    // carries session bounds through java.sql.Timestamp millis while the
    // batch path keeps the source's full microseconds
    def shape(df: org.apache.spark.sql.DataFrame) = df.select(
      org.apache.spark.sql.functions.col("user_id"),
      org.apache.spark.sql.functions.date_format(
        org.apache.spark.sql.functions.col("session_start"), "yyyy-MM-dd HH:mm:ss").as("s"),
      org.apache.spark.sql.functions.date_format(
        org.apache.spark.sql.functions.col("session_end"), "yyyy-MM-dd HH:mm:ss").as("e"),
      org.apache.spark.sql.functions.col("n_events"),
      org.apache.spark.sql.functions.col("sum_value"))
    val stateful = shape(StreamOps.sessionize(events).toDF())
    val batch = shape(StreamOps.sessionizeBatch(events))
    assert(batch.count() > 0)
    assert(stateful.exceptAll(batch).isEmpty && batch.exceptAll(stateful).isEmpty)
  }

  test("gap-boundary semantics: BOTH session forms keep a diff == gap event") {
    // COVERAGE.md used to claim session_window breaks at >= gap while
    // sessionize breaks at > gap; writing this fixture DISPROVED that —
    // session_window merges a window starting exactly at the previous
    // session's end (MergingSessionsIterator merges on start <= prev_end),
    // so both forms break only at diff STRICTLY > gap. The events data
    // has no exactly-at-gap pair, so only a boundary-exact fixture can
    // see this; pinning both here means a Spark upgrade (or a refactor
    // of sessionize's <= test) cannot silently flip either one.
    import spark.implicits._
    val gapMs = 30 * 60 * 1000L
    val events = Seq(
      (1L, "2026-01-01 10:00:00", 1.0),
      (1L, "2026-01-01 10:30:00", 2.0), // exactly last + gap
      (1L, "2026-01-01 11:00:00.001", 3.0), // 1 ms PAST the gap: breaks
      (1L, "2026-01-02 00:00:00", 4.0)) // closes whatever came before
      .toDF("user_id", "ts_s", "value")
      .withColumn("ts", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("ts_s")))
    // sessionize continues at diff == gap, breaks 1 ms past it: closed
    // sessions are (10:00 + 10:30) and the lone 11:00:00.001
    val stateful = StreamOps.sessionize(events, gapMs).collect()
      .map(s => (s.session_start.toString.take(19), s.n_events)).toSeq.sorted
    assert(stateful == Seq(("2026-01-01 10:00:00", 2L),
      ("2026-01-01 11:00:00", 1L)))
    // the built-in agrees on both boundaries (and also emits the still-
    // open far-future session, which append-mode sessionize withholds)
    val sw = events
      .groupBy(org.apache.spark.sql.functions.session_window(
        org.apache.spark.sql.functions.col("ts"), "30 minutes").as("sw"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .select(org.apache.spark.sql.functions.date_format(
        org.apache.spark.sql.functions.col("sw.start"),
        "yyyy-MM-dd HH:mm:ss").as("s"),
        org.apache.spark.sql.functions.col("n"))
      .as[(String, Long)].collect().toSeq.sorted
    assert(sw == Seq(("2026-01-01 10:00:00", 2L), ("2026-01-01 11:00:00", 1L),
      ("2026-01-02 00:00:00", 1L)))
  }

  test("stream-to-store ingest: every micro-batch lands in the append view") {
    // two files -> two micro-batches (maxFilesPerTrigger=1)
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_in_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("e1.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("e2.parquet"))
    val root = java.nio.file.Files.createTempDirectory("graft_stream_store_").toString
    val store = new graft.store.Store(spark, root, "ev")
    store.initialize()
    val stream = StreamOps.readEventsStream(spark, dir.toString)
      .select("event_id", "user_id", "event_type", "value")
    val q = StreamOps.ingestStream(stream, store, "events").start()
    try q.processAllAvailable() finally q.stop()
    val perFile = spark.read.parquet(s"$dir/e1.parquet").count()
    // append view holds BOTH batches; the versioned snapshot would keep
    // only the latest (that semantic is for reference tables)
    assert(store.appendedRows().count() == 2 * perFile)
    assert(store.readLog().filter(
      org.apache.spark.sql.functions.col("url").startsWith("stream:")).count() >= 2)
  }

  test("checkpointed ingest resumes without reprocessing earlier batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_ckpt_")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("e1.parquet"))
    val root = java.nio.file.Files.createTempDirectory("graft_ckpt_store_").toString
    val store = new graft.store.Store(spark, root, "ev")
    store.initialize()
    def run(): Unit = {
      val stream = StreamOps.readEventsStream(spark, dir.toString)
        .select("event_id", "user_id", "event_type", "value")
      val q = StreamOps.ingestStream(stream, store, "events")
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // first run consumes e1
    val perFile = spark.read.parquet(s"$dir/e1.parquet").count()
    assert(store.appendedRows().count() == perFile)
    // "restart": a new query on the same checkpoint sees only the new file
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("e2.parquet"))
    run()
    assert(store.appendedRows().count() == 2 * perFile) // e1 NOT re-ingested
  }

  test("streaming corpus preprocessing filters, redacts, and dedups by fingerprint") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val docsDir = java.nio.file.Files.createTempDirectory("graft_docs_stream_")
    Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00"),
        "mail a.user@example.com about the cat and the dog in the house"),
      (2L, java.sql.Timestamp.valueOf("2026-01-01 10:01:00"),
        "mail  A.USER@example.com about the cat and the dog in the house"), // ws/case dup of 1 post-redact? (case differs pre-redact)
      (3L, java.sql.Timestamp.valueOf("2026-01-01 10:02:00"),
        "le chat et le chien est pour la maison"),                          // french -> dropped
      (4L, java.sql.Timestamp.valueOf("2026-01-01 10:03:00"), "a b"),       // too short
      (5L, java.sql.Timestamp.valueOf("2026-01-01 10:04:00"),
        "completely different english text that is about the weather for today"))
      .toDF("doc_id", "ts", "text")
      .coalesce(1).write.parquet(docsDir.resolve("_staging").toString)
    // FileStreamSource lists top-level files only: lift the part file out
    // of the directory .write.parquet produced
    val part = java.nio.file.Files.list(docsDir.resolve("_staging"))
      .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.copy(part, docsDir.resolve("d1.parquet"))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("ts", TimestampType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(docsDir.toString)
    val q = StreamOps.preprocessDocsStream(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("docs_clean").start()
    try {
      q.processAllAvailable()
      val got = spark.table("docs_clean")
        .select("doc_id", "text").as[(Long, String)].collect().toMap
      // docs 1 and 2 share a fingerprint once the email is redacted and
      // whitespace/case normalize away — exactly one survives; 3 (french)
      // and 4 (too short) are filtered; 5 is kept
      assert(got.size == 2 && got.contains(5L))
      assert(got.contains(1L) ^ got.contains(2L))
      val redacted = got.collect { case (k, v) if k <= 2L => v }.head
      assert(redacted.contains("<EMAIL>") && !redacted.contains("@"))
    } finally q.stop()
  }

  test("streaming decontamination drops docs sharing an n-gram with the benchmark") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_decon_stream_")
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),   // shares 3-grams
      (2L, "a quick brown fox appears in completely new text"),
      (3L, "nothing in common with anything else at all"))
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(dir.resolve("_staging").toString)
    val part = java.nio.file.Files.list(dir.resolve("_staging"))
      .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.copy(part, dir.resolve("d1.parquet"))
    val bench = Seq("the quick brown fox runs far away").toDF("btext")
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    val q = StreamOps.decontaminateStream(stream, bench, "text", "btext", n = 3)
      .writeStream.outputMode("append").format("memory")
      .queryName("docs_decon").start()
    try {
      q.processAllAvailable()
      val got = spark.table("docs_decon").select("doc_id").as[Long].collect().toSet
      assert(got == Set(3L))
      // agrees with the batch-shape operator on the same data
      val batchKept = graft.text.TextOps.decontaminateNgramOverlap(
          spark.read.parquet(dir.resolve("d1.parquet").toString), bench,
          "doc_id", "text", "btext", n = 3)
        .select("doc_id").as[Long].collect().toSet
      assert(batchKept == got)
    } finally q.stop()
  }

  test("decontamination gram gate: the Bloom kernel engages above the cap and never leaks") {
    import spark.implicits._
    // 200 docs, half contaminated (share a bench 3-gram), half clean
    val docs = (1L to 200L).map { i =>
      if (i % 2 == 0) (i, s"clean document number $i with words w${i}a w${i}b w${i}c")
      else (i, s"leading text $i then shared secret passage ${i % 5} here")
    }.toDF("doc_id", "text")
    val bench = (0L to 4L).map(j => s"the shared secret passage $j here verbatim")
      .toDF("btext")
    val exact = StreamOps.decontaminateStream(docs, bench, "text", "btext",
        n = 3).select("doc_id").as[Long].collect().toSet
    assert(exact == (2L to 200L by 2).toSet, "exact kernel keeps exactly the clean half")
    // force the Bloom kernel (gate at 0 grams): one-sided error only —
    // every contaminated doc still drops; survivors are a subset of the
    // exact survivors (false positives drop clean docs, never leak)
    val bloomKept = StreamOps.decontaminateStream(docs, bench, "text", "btext",
        n = 3, maxExactGrams = 0).select("doc_id").as[Long].collect().toSet
    assert(bloomKept.subsetOf(exact), "bloom kernel must never keep a contaminated doc")
    // at fpp=0.001 over ~10 grams/doc, dropping >10% of clean docs
    // would mean the filter is broken, not just unlucky
    assert(bloomKept.size >= (exact.size * 0.9).toInt,
      s"bloom kept ${bloomKept.size} of ${exact.size} clean docs")
  }

  test("compactPartials folds history, renders unchanged, replayed max batch absorbed, crash heals") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cpart_")
    val cardDir = dir.resolve("card").toString
    def mkBatch(ids: Seq[Long], src: String) = ids
      .map(i => (i, s"some text body number $i.", "en", src))
      .toDF("doc_id", "text", "lang", "source")
    val batches = Seq(mkBatch(1L to 3L, "web"), mkBatch(4L to 6L, "web"),
      mkBatch(7L to 9L, "books"))
    batches.zipWithIndex.foreach { case (b, i) =>
      graft.streaming.StreamOps.dataCardIngestBatch(b, cardDir, i.toLong)
    }
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    def subdirs(d: String) = {
      val p = new org.apache.hadoop.fs.Path(d)
      val fsys = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsys.listStatus(p).count(_.getPath.getName.startsWith("batch_id="))
    }
    val before = rows(graft.streaming.StreamOps.dataCardRender(spark, cardDir))
    Seq("stats", "langs", "fps").foreach { fam =>
      assert(subdirs(s"$cardDir/$fam") == 3)
      assert(graft.streaming.StreamOps.compactPartials(spark, s"$cardDir/$fam") == 2)
      assert(subdirs(s"$cardDir/$fam") == 2) // base + preserved max
      // idempotent: nothing left to fold
      assert(graft.streaming.StreamOps.compactPartials(spark, s"$cardDir/$fam") == 0)
    }
    assert(rows(graft.streaming.StreamOps.dataCardRender(spark, cardDir)) == before)
    // the one re-deliverable batch (max id, crash between write and
    // checkpoint commit) overwrites its own PRESERVED subdir: no double count
    graft.streaming.StreamOps.dataCardIngestBatch(batches(2), cardDir, 2L)
    assert(rows(graft.streaming.StreamOps.dataCardRender(spark, cardDir)) == before)
    // second adopter: the uniform sample's bottom-k partials
    val sampDir = dir.resolve("samp").toString
    batches.zipWithIndex.foreach { case (b, i) =>
      graft.streaming.StreamOps.sampleIngestBatch(b, sampDir, i.toLong, "doc_id", k = 4)
    }
    val sBefore = rows(graft.streaming.StreamOps.sampleRender(spark, sampDir, k = 4))
    assert(graft.streaming.StreamOps.compactPartials(spark, s"$sampDir/bk") == 2)
    assert(rows(graft.streaming.StreamOps.sampleRender(spark, sampDir, k = 4)) == sBefore)
    graft.streaming.StreamOps.sampleIngestBatch(batches(2), sampDir, 2L, "doc_id", k = 4)
    assert(rows(graft.streaming.StreamOps.sampleRender(spark, sampDir, k = 4)) == sBefore)
    // crash mid-swap: live staged aside, tmp gone — the next render heals
    val statsDir = s"$cardDir/stats"
    val p = new org.apache.hadoop.fs.Path(statsDir)
    val fsys = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsys.rename(p, new org.apache.hadoop.fs.Path(s"${statsDir}__old"))
    assert(rows(graft.streaming.StreamOps.dataCardRender(spark, cardDir)) == before)
  }

  test("data card dup-sketch mode: flat partials, bounded error, mixed layout refused") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cardhll_")
    val exactDir = dir.resolve("exact").toString
    val hllDir = dir.resolve("hll").toString
    // 3 batches x 400 docs, 25% cross/in-batch duplicates
    val batches = (0 until 3).map { b =>
      (0 until 400).map { i =>
        val id = b * 400L + i
        val body = if (i % 4 == 0) "the one shared duplicate body."
          else s"unique body $id with extra words."
        (id, body, "en", if (i % 2 == 0) "web" else "books")
      }.toDF("doc_id", "text", "lang", "source")
    }
    batches.zipWithIndex.foreach { case (b, i) =>
      graft.streaming.StreamOps.dataCardIngestBatch(b, exactDir, i.toLong)
      graft.streaming.StreamOps.dataCardIngestBatch(b, hllDir, i.toLong,
        dupSketch = true)
    }
    // sketch partials are per-source rows (2), never per-doc (400)
    val hllRows = spark.read.parquet(s"$hllDir/fps_hll/batch_id=0").count()
    assert(hllRows == 2, s"sketch partial must be source-keyed, got $hllRows rows")
    val exact = graft.streaming.StreamOps.dataCardRender(spark, exactDir)
      .select("source", "dup_ratio").as[(String, Double)].collect().toMap
    val approx = graft.streaming.StreamOps.dataCardRender(spark, hllDir)
      .select("source", "dup_ratio").as[(String, Double)].collect().toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (src, e) =>
      assert(math.abs(approx(src) - e) <= 0.05,
        s"$src: sketch dup_ratio ${approx(src)} vs exact $e")
    }
    // replays rewrite their own sketch partial — never double-merge
    graft.streaming.StreamOps.dataCardIngestBatch(batches(1), hllDir, 1L,
      dupSketch = true)
    val replayed = graft.streaming.StreamOps.dataCardRender(spark, hllDir)
      .select("source", "dup_ratio").as[(String, Double)].collect().toMap
    assert(replayed == approx)
    // a card ingested in both modes is refused, not silently blended
    graft.streaming.StreamOps.dataCardIngestBatch(batches(0), hllDir, 7L)
    val e = intercept[IllegalArgumentException] {
      graft.streaming.StreamOps.dataCardRender(spark, hllDir)
    }
    assert(e.getMessage.contains("one dup mode"))
  }

  test("curation pipeline: checkpoint restart resumes; replayed batch changes nothing") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_spipe_t_")
    val srcDir = java.nio.file.Files.createDirectories(dir.resolve("src"))
    val ckpt = dir.resolve("ck").toString
    val pipeDir = dir.resolve("pipe").toString
    def mkDocs(ids: Seq[Long]) = ids.map { i =>
      val body = if (i % 6 == 0) "the forbidden benchmark passage appears right here today"
        else if (i % 3 == 0) "one shared duplicate body for the dedup stage to collapse."
        else s"unique clean document $i about topic ${i % 4} with several words."
      (i, body, "en", if (i % 2 == 0) "web" else "books")
    }.toDF("doc_id", "text", "lang", "source")
    def writeFile(ids: Seq[Long], name: String): Unit = {
      val staging = dir.resolve(s"_s$name")
      mkDocs(ids).coalesce(1).write.parquet(staging.toString)
      val part = java.nio.file.Files.list(staging)
        .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(part, srcDir.resolve(s"$name.parquet")): Unit
    }
    val bench = Seq("the forbidden benchmark passage appears right here today")
      .toDF("text")
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType),
      StructField("source", StringType)))
    def run(): Unit = {
      val docs = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
      val q = graft.streaming.StreamOps.curationPipelineStream(
          docs, pipeDir, bench, "text", n = 3, capK = 5)
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    writeFile(1L to 12L, "d0")
    run()
    // "restart": a new query on the same checkpoint consumes only d1
    writeFile(13L to 24L, "d1")
    run()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    val render = graft.streaming.StreamOps.curationRender(spark, pipeDir, capK = 5)
    val got = rows(render)
    // the batch composition over the SAME 24 docs: decontaminate, card,
    // cap, distinct-fp corpus — computed with the proven batch pieces
    val all = mkDocs(1L to 24L)
    val decon = graft.text.TextOps.decontaminateNgramOverlap(
      all, bench, "doc_id", "text", "text", n = 3).localCheckpoint()
    val card = graft.text.DataCard.perSource(decon, "doc_id", "text", "lang", "source")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy(md5(concat(lit("samp:"), $"doc_id".cast("string"))))
    val cap = decon.withColumn("__rn", row_number().over(w)).where($"__rn" <= 5)
      .groupBy($"source").agg(count(lit(1)).cast("long").as("cap_n"),
        min($"doc_id").as("cap_min_doc"))
    val corpusDocs = decon
      .select(graft.text.TextOps.fingerprintMd5($"text")).distinct().count()
    val expect = rows(card.join(cap, "source")
      .withColumn("corpus_docs", lit(corpusDocs)))
    assert(got == expect && got.nonEmpty)
    // every doc dropped by the gate shares the benchmark passage; the
    // corpus holds one row per distinct fingerprint
    assert(spark.read.parquet(s"$pipeDir/corpus").count() == corpusDocs)
    // a crash replay of the LAST batch re-runs all three stage ingests
    // with the same batch id: partials rewrite in place, the absorbing
    // corpus append filters to empty — the render is unchanged
    val lastBatch = graft.streaming.StreamOps.decontaminateStream(
      mkDocs(13L to 24L), bench, "text", "text", n = 3)
    graft.streaming.StreamOps.dataCardIngestBatch(lastBatch, s"$pipeDir/card", 1L)
    graft.streaming.StreamOps.sampleByIngestBatch(lastBatch, s"$pipeDir/cap", 1L,
      "source", "doc_id", k = 5)
    assert(graft.streaming.StreamOps.fpDedupIngestBatch(
      lastBatch, s"$pipeDir/corpus") == 0L)
    assert(rows(graft.streaming.StreamOps.curationRender(spark, pipeDir,
      capK = 5)) == expect)
  }

  test("fpDedupIngestBatch: null texts never inflate the corpus; a crashed first append cannot wedge the stream") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_exdedup_")
    val corpus = dir.resolve("corpus").toString
    // a crashed very first append: the dir exists with only the
    // committer's _temporary skeleton and NO committed part files — the
    // replay must treat it as an empty corpus, not throw
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(corpus, "_temporary", "0"))
    def batch(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    val b = Seq(1L -> "alpha body", 2L -> (null: String), 3L -> "beta body")
    assert(graft.streaming.StreamOps.fpDedupIngestBatch(
      batch(b), corpus) == 2L) // null text dropped, two real docs kept
    // a second batch carrying ANOTHER null text and one replayed doc:
    // without the null filter the null-fp row would re-append forever
    val b2 = Seq(4L -> (null: String), 5L -> "alpha body", 6L -> "gamma body")
    assert(graft.streaming.StreamOps.fpDedupIngestBatch(
      batch(b2), corpus) == 1L)
    val got = spark.read.parquet(corpus)
    assert(got.count() == 3L) // alpha, beta, gamma — no null rows, no dups
    assert(got.where($"text".isNull).count() == 0L)
  }

  test("compactCorpus: folds the absorbing-append corpus, replays still absorbed, mid-swap crash heals") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ccorpus_")
    val corpus = dir.resolve("corpus").toString
    def batch(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    def ingest(rows: Seq[(Long, String)]) =
      graft.streaming.StreamOps.fpDedupIngestBatch(batch(rows), corpus)
    def parts() = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(corpus))
      try s.filter(p => p.getFileName.toString.startsWith("part-")).count()
      finally s.close()
    }
    def rowSet() = spark.read.parquet(corpus)
      .select($"doc_id", $"text").collect().map(_.toSeq).toSet
    // many tiny batches -> many file sets
    (0 until 6).foreach(i => ingest(Seq(i.toLong -> s"doc body $i")))
    val before = rowSet()
    assert(parts() > 2)
    assert(graft.streaming.StreamOps.compactCorpus(spark, corpus,
      targetFiles = 2) > 0)
    assert(parts() <= 2, "corpus must fold to the target file count")
    assert(rowSet() == before, "compaction is a pure file reorganisation")
    // idempotent: already at target -> nothing to do
    assert(graft.streaming.StreamOps.compactCorpus(spark, corpus,
      targetFiles = 2) == 0)
    // replays absorb by CONTENT against the compacted corpus
    assert(ingest(Seq(3L -> "doc body 3")) == 0L)
    // new docs still land
    assert(ingest(Seq(99L -> "novel body")) == 1L)
    // mid-swap crash: live renamed aside, __old holds the corpus — the
    // next ingest heals before reading
    java.nio.file.Files.move(java.nio.file.Paths.get(corpus),
      java.nio.file.Paths.get(corpus + "__old"))
    assert(ingest(Seq(100L -> "post-crash body")) == 1L)
    assert(rowSet().size == before.size + 2)
  }

  test("streaming dedup ingest: corpus accumulates only novel docs; replay is a no-op") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("graft_dingest_in_")
    val corpus = java.nio.file.Files.createTempDirectory("graft_dingest_c_")
      .resolve("corpus").toString
    val tA = "alpha beta gamma delta epsilon zeta"
    val tB = "completely different text with no shared shingles at all"
    // batch 1: two novel docs + one IN-batch exact dup (id 6 of tB)
    Seq((1L, tA), (2L, tB), (6L, tB)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$in/f1")
    // batch 2: exact dup of tA, a near-dup of tA (trigram J=0.6), one novel
    val tNear = "alpha beta gamma delta epsilon eta"
    val tC = "yet another fully unrelated document body for the third batch"
    Seq((3L, tA), (4L, tNear), (5L, tC)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$in/f2")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id LONG, text STRING")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$in/f*")
    val q = StreamOps.dedupIngestStream(stream, corpus).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
    // 6 dropped in-batch, 3 exact-dups corpus, 4 near-dups corpus, 5 novel
    assert(got == Set(1L, 2L, 5L))
    // crash-replay of batch 2: every row now duplicates the corpus -> 0
    val replay = spark.read.parquet(s"$in/f2")
    assert(StreamOps.dedupIngestBatch(replay, corpus) == 0L)
    assert(spark.read.parquet(corpus).count() == 3)
  }

  test("healthStream: per-window audit rows with windowed dup mass") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_health_stream_")
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:10:00")
    val t1 = java.sql.Timestamp.valueOf("2026-01-01 11:20:00")
    Seq(
      (1L, t0, "the cat sat on the mat today with fine long words"),
      (2L, t0, "the cat sat on the mat today with fine long words"), // dup
      (3L, t0, "tiny"),                                              // short
      (4L, t1, "a completely different and longer document in the second hour window"))
      .toDF("doc_id", "ts", "text")
      .coalesce(1).write.parquet(dir.resolve("_staging").toString)
    val part = java.nio.file.Files.list(dir.resolve("_staging"))
      .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.copy(part, dir.resolve("d1.parquet"))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("ts", TimestampType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    // complete mode surfaces open windows too (append would hold them
    // until the watermark passes — correct for production sinks, opaque
    // for a single-batch assertion)
    val q = StreamOps.healthStream(stream)
      .writeStream.outputMode("complete").format("memory")
      .queryName("health_rows").start()
    try {
      q.processAllAvailable()
      val got = spark.table("health_rows")
        .select("window_start", "n_docs", "n_tokens", "mean_doc_tokens",
          "approx_dup_mass", "pct_short")
        .as[(java.sql.Timestamp, Long, Long, Double, Double, Double)]
        .collect().sortBy(_._1.getTime).toSeq
      assert(got.size == 2)
      val first = got.head // the 10:00 window: docs 1, 2 (dup), 3 (short)
      assert(first._2 == 3 && first._3 == 23)
      assert(first._4 == 7.6667) // (11 + 11 + 1) / 3
      assert(first._5 == 0.3333) // 2 distinct fps over 3 docs
      assert(first._6 == 0.3333) // one short doc
      val second = got(1)        // the 11:00 window: one novel doc
      assert(second._2 == 1 && second._5 == 0.0 && second._6 == 0.0)
    } finally q.stop()
  }

  test("streaming dedup drops replayed event_ids") {
    val deduped = StreamOps.dedupedStream(
      StreamOps.readEventsStream(spark, streamDir))
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_events").start()
    try {
      q.processAllAvailable()
      val n = spark.table("dedup_events").count()
      val distinct = spark.read.parquet(s"$streamDir/events.parquet")
        .select("event_id").distinct().count()
      assert(n == distinct)
    } finally q.stop()
  }

  test("packStream: per-shard offsets are contiguous across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_pack_stream_")
    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit = {
      val staging = dir.resolve(s"_s_$name")
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(staging.toString)
      val part = java.nio.file.Files.list(staging)
        .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(part, dir.resolve(s"$name.parquet"))
    }
    def doc(id: Long, n: Int) = (id, (1 to n).map(j => s"t${id}_$j").mkString(" "))
    writeBatch("b1", Seq(doc(1, 3), doc(2, 7), doc(3, 2), doc(4, 1), (5L, "   ")))
    writeBatch("b2", Seq(doc(6, 4), doc(7, 6), doc(8, 2), doc(9, 9)))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = StreamOps.packStream(stream, "doc_id", "text", ctxLen = 5, nShards = 3)
      .writeStream.outputMode("append").format("memory")
      .queryName("pack_stream").start()
    try {
      q.processAllAvailable()
      val got = spark.table("pack_stream")
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      assert(got.length == 8)                 // blank doc 5 emits nothing
      assert(!got.exists(_._1 == 5L))
      got.groupBy(_._2).foreach { case (shard, rs) =>
        val sorted = rs.sortBy(_._4)
        assert(sorted.head._4 == 0L, s"shard $shard starts at 0")
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(a._4 + a._3 == b._4,
            s"shard $shard gap between ${a._1} and ${b._1}")
          case _ =>
        }
        sorted.foreach { case (_, _, n, start, f, l) =>
          assert(f == start / 5 && l == (start + n - 1) / 5)
        }
        // each shard holds exactly its docs' tokens
        assert(sorted.map(_._3).sum ==
          rs.map(_._1).map(id => Seq(3, 7, 2, 1, 0, 4, 6, 2, 9)(id.toInt - 1).toLong).sum)
      }
    } finally q.stop()
  }

  test("packStream: checkpoint restart continues shard offsets, never re-emits") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_pack_restart_")
    val outDir = dir.resolve("out").toString
    val ckDir = dir.resolve("ck").toString
    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit = {
      val staging = dir.resolve(s"_s_$name")
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(staging.toString)
      val part = java.nio.file.Files.list(staging)
        .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(part, dir.resolve(s"in_$name.parquet"))
    }
    def doc(id: Long, n: Int) = (id, (1 to n).map(j => s"t${id}_$j").mkString(" "))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    def run(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir.toString + "/in_*.parquet")
      val q = StreamOps.packStream(stream, "doc_id", "text", ctxLen = 4, nShards = 2)
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir).start()
      try q.processAllAvailable() finally q.stop()
    }
    writeBatch("b1", Seq(doc(2, 3), doc(4, 5)))   // both shard 0
    run()
    writeBatch("b2", Seq(doc(6, 2), doc(3, 4)))   // shard 0 continues; shard 1 starts
    run()
    val got = spark.read.parquet(outDir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == 4)                        // nothing re-emitted
    val byDoc = got.map(r => r._1 -> r).toMap
    assert(byDoc(2L)._4 == 0L && byDoc(4L)._4 == 3L)
    assert(byDoc(6L)._4 == 8L)                     // restart resumed at 3+5
    assert(byDoc(3L)._4 == 0L)                     // fresh shard starts at 0
  }

  test("round-8 families compose with streams: html extraction + chat stats are stateless") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_r8_stream_")
    val page = "<p>the cat and the dog is in the house</p>" +
      "<div class=\"nav\"><a href=\"/\">home login</a></div>"
    val chat = """{"messages":[{"role":"user","content":"hi there"},
      {"role":"assistant","content":"hello to you"}]}"""
    Seq((1L, page, chat), (2L, "<p>short</p>", "{bad json"))
      .toDF("doc_id", "html", "js")
      .coalesce(1).write.parquet(dir.resolve("_staging").toString)
    val part = java.nio.file.Files.list(dir.resolve("_staging"))
      .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.copy(part, dir.resolve("d1.parquet"))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("html", StringType), StructField("js", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    // both families are row-local projections, so they lift onto a
    // stream unchanged — no state, no watermark, append mode
    val q = graft.text.Chat.stats(
        stream.withColumn("main",
          graft.text.Html.mainText(
            org.apache.spark.sql.functions.col("html"), 10, 0.1)),
        "doc_id", "js")
      .writeStream.outputMode("append").format("memory")
      .queryName("r8_stream").start()
    try {
      q.processAllAvailable()
      val got = spark.table("r8_stream")
        .as[(Long, Long, Long, Long, Long, Boolean)].collect()
        .map(r => r._1 -> r).toMap
      assert(got(1L)._6 && got(1L)._2 == 2L) // valid 2-turn conversation
      assert(!got(2L)._6 && got(2L)._2 == 0L) // bad JSON -> statistic, not crash
    } finally q.stop()
  }

  test("streaming chat pipeline matches the batch composition's prefix (stream == batch)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    def conv(turns: (String, String)*): String =
      turns.map { case (r, c) => s"""{"role":"$r","content":"$c"}""" }
        .mkString("""{"messages":[""", ",", "]}")
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00"),
        conv("user" -> "mail a.user@example.com now",
          "assistant" -> "sent via https://ex.com/q ok")),
      (2L, java.sql.Timestamp.valueOf("2026-01-01 10:01:00"),
        conv("user" -> "hello", "bot" -> "bad role")),        // schema-dropped
      (3L, java.sql.Timestamp.valueOf("2026-01-01 10:02:00"),
        conv("user" -> "mail a.user@example.com now",         // dup render of 1
          "assistant" -> "sent via https://ex.com/q ok")),
      (4L, java.sql.Timestamp.valueOf("2026-01-01 10:03:00"),
        conv("user" -> "a different question entirely",
          "assistant" -> "a different answer entirely")))
    val dir = java.nio.file.Files.createTempDirectory("graft_chat_stream_")
    rows.toDF("doc_id", "ts", "js")
      .coalesce(1).write.parquet(dir.resolve("_staging").toString)
    val part = java.nio.file.Files.list(dir.resolve("_staging"))
      .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.copy(part, dir.resolve("d1.parquet"))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("ts", TimestampType), StructField("js", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = StreamOps.preprocessChatStream(stream, "doc_id", "js")
      .writeStream.outputMode("append").format("memory")
      .queryName("chat_stream").start()
    try {
      q.processAllAvailable()
      val streamGot = spark.table("chat_stream")
        .select("doc_id", "text").as[(Long, String)].collect().toMap
      // batch composition on the same rows (no packing: the stream
      // prefix ends at the deduped renders)
      val (batchOut, _) = graft.text.CorpusPipeline.preprocessChat(
        rows.toDF("doc_id", "ts", "js"), "doc_id", "js")
      val batchGot = batchOut.select("id", "text").as[(Long, String)]
        .collect().toMap
      // same survivor TEXTS; ids may differ on the dup pair (watermark
      // dedup keeps arrival order, batch keeps min id — both keep ONE)
      assert(streamGot.values.toSet == batchGot.values.toSet)
      assert(streamGot.size == 2 && batchGot.keySet == Set(1L, 4L))
      assert(streamGot.values.exists(t =>
        t.contains("<EMAIL>") && t.contains("<URL>") && !t.contains("@")))
    } finally q.stop()
  }

  test("round-9 families lift onto streams: sentence chunking + random projection (stream == batch)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_r9_stream_")
    val rows = Seq(
      (1L, "a b one. c d two. e three.", Array.tabulate(8)(i => (i + 1).toFloat)),
      (2L, "just one sentence", Array.fill(8)(0.25f)))
    rows.toDF("doc_id", "text", "embedding")
      .coalesce(1).write.parquet(dir.resolve("_staging").toString)
    val part = java.nio.file.Files.list(dir.resolve("_staging"))
      .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.copy(part, dir.resolve("d1.parquet"))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("embedding", ArrayType(FloatType))))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    // both ops are row-local projections/explodes — stateless on a
    // stream: append mode, no watermark
    val q = graft.text.TextOps.chunkSentences(
        graft.vec.Reduce.randomProject(stream, "embedding", "proj",
          inDim = 8, outDim = 2),
        "doc_id", "text", maxTokens = 6)
      .writeStream.outputMode("append").format("memory")
      .queryName("r9_stream").start()
    try {
      q.processAllAvailable()
      val streamGot = spark.table("r9_stream")
        .select("doc_id", "chunk_id", "chunk_text")
        .as[(Long, Long, String)].collect().toSet
      val batchGot = graft.text.TextOps.chunkSentences(
          graft.vec.Reduce.randomProject(
            spark.read.parquet(dir.resolve("d1.parquet").toString),
            "embedding", "proj", inDim = 8, outDim = 2),
          "doc_id", "text", maxTokens = 6)
        .select("doc_id", "chunk_id", "chunk_text")
        .as[(Long, Long, String)].collect().toSet
      assert(streamGot == batchGot && streamGot.nonEmpty)
      assert(streamGot.exists(_._3 == "a b one. c d two."))
    } finally q.stop()
  }

  test("round-10 families lift onto streams: wordpiece encode + SQ8 round trip (stream == batch)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_r10_stream_")
    val rows = Seq(
      (1L, "abc ab c", Array.tabulate(4)(i => (i + 1).toFloat)),
      (2L, "c abc abc", Array.fill(4)(0.5f)))
    rows.toDF("doc_id", "text", "embedding")
      .coalesce(1).write.parquet(dir.resolve("_staging").toString)
    val part = java.nio.file.Files.list(dir.resolve("_staging"))
      .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.copy(part, dir.resolve("d1.parquet"))
    val batchDf = spark.read.parquet(dir.resolve("d1.parquet").toString)
    // models train on the BATCH corpus (the deployment shape: train
    // offline, apply to the stream); both applications are row-local
    val vocab = graft.text.Wordpiece.Vocab(
      initials = Seq("abc", "a", "b", "c"), continuations = Seq("b", "c"))
    val sq8 = graft.vec.Quantize.sq8Train(batchDf, "embedding", dims = 4)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("embedding", ArrayType(FloatType))))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    def pipe(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      graft.text.Wordpiece.encode(
        df.withColumn("dq", graft.vec.Quantize.sq8Roundtrip(
          org.apache.spark.sql.functions.col("embedding"), sq8)),
        "doc_id", "text", vocab)
    val q = pipe(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("r10_stream").start()
    try {
      q.processAllAvailable()
      val streamGot = spark.table("r10_stream")
        .select("doc_id", "widx", "pidx", "piece")
        .as[(Long, Long, Long, String)].collect().toSet
      val batchGot = pipe(batchDf)
        .select("doc_id", "widx", "pidx", "piece")
        .as[(Long, Long, Long, String)].collect().toSet
      assert(streamGot == batchGot && streamGot.nonEmpty)
      assert(streamGot((1L, 1L, 1L, "abc"))) // greedy longest match held on the stream
    } finally q.stop()
  }

  test("round-10b: DSIR + full-batch-LR models score streams (frozen models, stream == batch)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_r10b_stream_")
    val rows = Seq((1L, "cat cat purrs"), (2L, "stock day one"),
      (3L, "cat sleeps here"))
    rows.toDF("doc_id", "text")
      .coalesce(1).write.parquet(dir.resolve("_staging").toString)
    val part = java.nio.file.Files.list(dir.resolve("_staging"))
      .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.copy(part, dir.resolve("d1.parquet"))
    val batchDf = spark.read.parquet(dir.resolve("d1.parquet").toString)
    // both models train OFFLINE (the deployment shape); the stream only scores
    val target = Seq((100L, "cat cat cat")).toDF("doc_id", "text")
    val raw = Seq((200L, "stock market day")).toDF("doc_id", "text")
    val dsirModel = graft.text.Dsir.fit(target, raw, "text", "doc_id")
    val lrModel = graft.text.QualityClassifier.trainFullBatch(
      target, raw, "doc_id", "text", dim = 64, iters = 10, lr = 1.0)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    // LR margin is row-local -> scores directly in the streaming plan;
    // DSIR's per-doc agg runs inside each micro-batch via foreachBatch
    // (docs arrive whole — the per-batch score IS the doc score)
    val sink = dir.resolve("dsir_scores").toString
    val q = graft.text.QualityClassifier.score(stream, "doc_id", "text", lrModel)
      .writeStream.outputMode("append").format("memory")
      .queryName("r10b_lr").start()
    val q2 = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.text.Dsir.logWeights(batch, "doc_id", "text", dsirModel)
          .write.mode("append").parquet(sink)
      }.start()
    try {
      q.processAllAvailable(); q2.processAllAvailable()
      val lrStream = spark.table("r10b_lr")
        .as[(Long, Double)].collect().toSet
      val lrBatch = graft.text.QualityClassifier
        .score(batchDf, "doc_id", "text", lrModel)
        .as[(Long, Double)].collect().toSet
      assert(lrStream == lrBatch && lrStream.nonEmpty)
      val dsirStream = spark.read.parquet(sink)
        .as[(Long, Long, Double)].collect().toSet
      val dsirBatch = graft.text.Dsir.logWeights(batchDf, "doc_id", "text", dsirModel)
        .as[(Long, Long, Double)].collect().toSet
      assert(dsirStream == dsirBatch && dsirStream.nonEmpty)
      // and the scores separate the domains on the stream side too
      val byId = dsirStream.map(t => t._1 -> t._3).toMap
      assert(byId(1L) > byId(2L))
    } finally { q.stop(); q2.stop() }
  }

  test("round-10c: generation-eval kernels score streams (rougeL/rouge2, stream == batch)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_r10c_stream_")
    val rows = Seq((1L, "the cat sat on the mat", "the dog sat on a mat"),
      (2L, "alpha beta gamma", "alpha beta gamma"),
      (3L, "one two three", "four five six"))
    rows.toDF("id", "cand", "ref")
      .coalesce(1).write.parquet(dir.resolve("_staging").toString)
    val part = java.nio.file.Files.list(dir.resolve("_staging"))
      .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.copy(part, dir.resolve("d1.parquet"))
    val batchDf = spark.read.parquet(dir.resolve("d1.parquet").toString)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("cand", StringType), StructField("ref", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    // both metrics are row-local codegen kernels -> stream directly
    val q = graft.text.GenEval.rougeL(stream, "id", "cand", "ref")
      .writeStream.outputMode("append").format("memory")
      .queryName("r10c_rougel").start()
    val q2 = graft.text.GenEval.rougeN(stream, "id", "cand", "ref", n = 2)
      .writeStream.outputMode("append").format("memory")
      .queryName("r10c_rouge2").start()
    try {
      q.processAllAvailable(); q2.processAllAvailable()
      val sL = spark.table("r10c_rougel")
        .as[(Long, Long, Long, Long, Double, Double, Double)].collect().toSet
      val bL = graft.text.GenEval.rougeL(batchDf, "id", "cand", "ref")
        .as[(Long, Long, Long, Long, Double, Double, Double)].collect().toSet
      assert(sL == bL && sL.nonEmpty)
      val s2 = spark.table("r10c_rouge2")
        .as[(Long, Long, Long, Long, Double, Double, Double)].collect().toSet
      val b2 = graft.text.GenEval.rougeN(batchDf, "id", "cand", "ref", n = 2)
        .as[(Long, Long, Long, Long, Double, Double, Double)].collect().toSet
      assert(s2 == b2 && s2.nonEmpty)
      // exact pair scored 1.0 on the stream, disjoint pair 0.0
      assert(sL.exists(t => t._1 == 2L && t._7 == 1.0))
      assert(sL.exists(t => t._1 == 3L && t._7 == 0.0))
    } finally { q.stop(); q2.stop() }
  }

  test("round-10d: corruption transforms stream (md5-of-id cuts, stream == batch)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_r10d_stream_")
    val rows = (1L to 8L).map(i =>
      (i, s"document number $i with enough characters to be split three ways"))
    rows.toDF("doc_id", "text")
      .coalesce(1).write.parquet(dir.resolve("_staging").toString)
    val part = java.nio.file.Files.list(dir.resolve("_staging"))
      .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.copy(part, dir.resolve("d1.parquet"))
    val batchDf = spark.read.parquet(dir.resolve("d1.parquet").toString)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    // FIM cuts are md5(doc_id)-derived -> identical on stream and batch
    val q = graft.text.Corruption.fimSplit(stream, "doc_id", "text")
      .select("doc_id", "cut1", "cut2", "psm")
      .writeStream.outputMode("append").format("memory")
      .queryName("r10d_fim").start()
    try {
      q.processAllAvailable()
      val s = spark.table("r10d_fim")
        .as[(Long, Long, Long, String)].collect().toSet
      val b = graft.text.Corruption.fimSplit(batchDf, "doc_id", "text")
        .select("doc_id", "cut1", "cut2", "psm")
        .as[(Long, Long, Long, String)].collect().toSet
      assert(s == b && s.size == 8)
    } finally { q.stop() }
  }

  test("round-10g: the live data card equals the batch card, and replays never double-count") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_r10g_card_")
    val cardDir = dir.resolve("card").toString
    val b1 = Seq(
      (1L, "he ran. she ran.", "en", "web"),
      (2L, "he ran. she ran.", "en", "web"),          // dup of 1
      (3L, "mail a@b.com now!", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val b2 = Seq(
      (4L, "he ran. she ran.", "en", "web"),          // cross-batch dup
      (5L, "hola amigo.", "es", "web"),
      (6L, "clean single doc.", "en", "books"))
      .toDF("doc_id", "text", "lang", "source")
    graft.streaming.StreamOps.dataCardIngestBatch(b1, cardDir, 0L)
    graft.streaming.StreamOps.dataCardIngestBatch(b2, cardDir, 1L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val live = graft.streaming.StreamOps.dataCardRender(spark, cardDir)
    val batchCard = graft.text.DataCard.perSource(
      b1.unionByName(b2), "doc_id", "text", "lang", "source")
    assert(rows(live) == rows(batchCard))
    // the web dup_ratio sees BOTH the in-batch and the cross-batch dup
    assert(live.where($"source" === "web").select("dup_ratio")
      .as[Double].head() == 0.4)
    // a crash replay re-runs batch 1: partials are rewritten in place,
    // the card is unchanged
    graft.streaming.StreamOps.dataCardIngestBatch(b1, cardDir, 0L)
    assert(rows(graft.streaming.StreamOps.dataCardRender(spark, cardDir))
      == rows(batchCard))

    // the stream wrapper folds file-source micro-batches the same way
    val sdir = dir.resolve("in")
    java.nio.file.Files.createDirectories(sdir)
    Seq(b1, b2).zipWithIndex.foreach { case (b, i) =>
      val staging = dir.resolve(s"_s$i")
      b.coalesce(1).write.parquet(staging.toString)
      val part = java.nio.file.Files.list(staging)
        .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(part, sdir.resolve(s"d$i.parquet"))
    }
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType),
      StructField("source", StringType)))
    val cardDir2 = dir.resolve("card2").toString
    val q = graft.streaming.StreamOps.dataCardStream(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(sdir.toString), cardDir2)
      .option("checkpointLocation", dir.resolve("ckpt").toString).start()
    try {
      q.processAllAvailable()
      assert(rows(graft.streaming.StreamOps.dataCardRender(spark, cardDir2))
        == rows(batchCard))
    } finally { q.stop() }
  }

  test("round-10g: live Bradley-Terry ratings equal the batch solve; replays absorbed") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r10g_bt_")
    val rdir = dir.resolve("ratings").toString
    val b1 = (Seq.fill(3)(("A", "B")) ++ Seq(("B", "C"), ("A", "A")))
      .toDF("winner", "loser")
    val b2 = (Seq.fill(2)(("B", "A")) ++ Seq(("C", "B"), ("A", "C")))
      .toDF("winner", "loser")
    graft.streaming.StreamOps.prefGamesIngestBatch(b1, rdir, 0L)
    graft.streaming.StreamOps.prefGamesIngestBatch(b2, rdir, 1L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val live = graft.streaming.StreamOps.bradleyTerryRender(spark, rdir)
    val batch = graft.text.Labels.bradleyTerry(
      b1.unionByName(b2), "winner", "loser")
    assert(rows(live) == rows(batch) && live.count() == 3)
    // crash replay of batch 0: partial rewritten, ratings unchanged
    graft.streaming.StreamOps.prefGamesIngestBatch(b1, rdir, 0L)
    assert(rows(graft.streaming.StreamOps.bradleyTerryRender(spark, rdir))
      == rows(batch))
  }

  test("round-10f: privacy audit + URL domain counts run as live streaming aggregations (stream == batch)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_r10f_stream_")
    val rows = (1L to 12L).map { i =>
      (i, s"z${i % 3}", s"http://WWW.site${i % 2}.co.uk/p/$i?utm_source=x")
    }
    rows.take(6).toDF("id", "zip", "url")
      .coalesce(1).write.parquet(dir.resolve("b1").toString)
    rows.drop(6).toDF("id", "zip", "url")
      .coalesce(1).write.parquet(dir.resolve("b2").toString)
    Seq(1, 2).foreach { k =>
      val part = java.nio.file.Files.list(dir.resolve(s"b$k"))
        .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(part, dir.resolve(s"d$k.parquet"))
    }
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("zip", StringType), StructField("url", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString + "/d*.parquet")
    // the k-anonymity class audit is ONE keyed aggregation, so it runs
    // live in complete mode — a release gate that updates as data lands
    val quasi = Seq("zip" -> col("zip"))
    val qk = graft.ops.Privacy.kAnonymity(stream, quasi, k = 5)
      .writeStream.outputMode("complete").format("memory")
      .queryName("r10f_kanon").start()
    // the URL-curation kernels are row-local projections, so the
    // per-domain crawl counts stream the same way
    val qd = stream
      .select(graft.text.UrlOps.registrableDomain(
        graft.text.UrlOps.hostOf(col("url"))).as("domain"))
      .groupBy(col("domain")).agg(count(lit(1)).as("n_urls"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("r10f_domains").start()
    try {
      qk.processAllAvailable(); qd.processAllAvailable()
      val sk = spark.table("r10f_kanon")
        .as[(String, Long, Boolean)].collect().toSet
      val bk = graft.ops.Privacy.kAnonymity(
          rows.toDF("id", "zip", "url"), quasi, k = 5)
        .as[(String, Long, Boolean)].collect().toSet
      assert(sk == bk && sk.size == 3)
      val sd = spark.table("r10f_domains")
        .as[(String, Long)].collect().toSet
      assert(sd == Set(("site0.co.uk", 6L), ("site1.co.uk", 6L)))
    } finally { qk.stop(); qd.stop() }
  }

  test("round-10e: shard audit runs as a live streaming aggregation (stream == batch)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_r10e_stream_")
    val rows = (1L to 12L).map(i => (i, s"audit doc $i body"))
    // two files -> two micro-batches; complete mode keeps the audit live
    rows.take(6).toDF("doc_id", "text")
      .coalesce(1).write.parquet(dir.resolve("b1").toString)
    rows.drop(6).toDF("doc_id", "text")
      .coalesce(1).write.parquet(dir.resolve("b2").toString)
    Seq(1, 2).foreach { k =>
      val part = java.nio.file.Files.list(dir.resolve(s"b$k"))
        .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(part, dir.resolve(s"d$k.parquet"))
    }
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString + "/d*.parquet")
    val q = graft.text.Sharding.audit(stream, "doc_id", "text", nShards = 3)
      .writeStream.outputMode("complete").format("memory")
      .queryName("r10e_audit").start()
    try {
      q.processAllAvailable()
      val s = spark.table("r10e_audit")
        .as[(Int, Long, Long, Long, Long, Long)].collect().toSet
      val b = graft.text.Sharding.audit(rows.toDF("doc_id", "text"),
          "doc_id", "text", nShards = 3)
        .as[(Int, Long, Long, Long, Long, Long)].collect().toSet
      assert(s == b && s.nonEmpty)
    } finally { q.stop() }
  }

  test("streaming ANN ingest: batches land in the VecIndex, replayed ids are absorbed") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_vecidx_stream_")
    val idxDir = dir.resolve("idx").toString
    def vec(seed: Int): Array[Float] = {
      val rng = new scala.util.Random(seed)
      val v = Array.fill(8)(rng.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    // seed index from an initial corpus
    val seedVecs = (0L until 20L).map(i => (i, vec(i.toInt)))
    graft.vec.VecIndex.build(seedVecs.toDF("vec_id", "embedding"), idxDir,
      nlist = 4, kmeansIters = 1)
    def writeBatch(name: String, rows: Seq[(Long, Array[Float])]): Unit = {
      val staging = dir.resolve(s"_s_$name")
      rows.toDF("vec_id", "embedding").coalesce(1).write.parquet(staging.toString)
      val part = java.nio.file.Files.list(staging)
        .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(part, dir.resolve(s"in/in_$name.parquet"))
    }
    java.nio.file.Files.createDirectories(dir.resolve("in"))
    // batch 1: 5 new ids, one of them (24) DUPLICATED WITHIN the batch;
    // batch 2: 3 new ids + 2 REPLAYS of batch 1 ids
    writeBatch("b1", (20L until 25L).map(i => (i, vec(i.toInt))) ++
      Seq((24L, vec(24))))
    writeBatch("b2", (25L until 28L).map(i => (i, vec(i.toInt))) ++
      Seq((20L, vec(20)), (21L, vec(21))))
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.resolve("in").toString)
    val q = StreamOps.vecIndexIngestStream(stream, idxDir)
      .option("checkpointLocation", dir.resolve("ck").toString).start()
    try {
      q.processAllAvailable()
      val ids = spark.read.parquet(s"$idxDir/lists").select("id")
        .as[Long].collect().sorted.toSeq
      // union without duplicates: replayed 20/21 AND the intra-batch
      // duplicate 24 absorbed — each id appears exactly once
      assert(ids == (0L until 28L).toSeq)
      // the index still probes correctly for an appended vector
      val probe = graft.vec.VecIndex.topK(
        Seq((26L, vec(26))).toDF("vec_id", "embedding"), idxDir,
        "vec_id", "embedding", k = 3, nprobe = 4)
      assert(probe.where($"rank" === 1).select("neighbor_id").as[Long]
        .head() != 26L) // self excluded, a real neighbor returned
      assert(probe.count() == 3)
    } finally q.stop()
  }

  test("streaming winnow-index ingest: live passage attribution, replays append nothing") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_widx_stream_")
    val idxDir = dir.resolve("idx").toString
    val boiler = "subscribe to our weekly newsletter for updates and news"
    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit = {
      val staging = dir.resolve(s"_s_$name")
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(staging.toString)
      val part = java.nio.file.Files.list(staging)
        .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(part, dir.resolve(s"in/in_$name.parquet"))
    }
    java.nio.file.Files.createDirectories(dir.resolve("in"))
    // batch 1: docs 1-2 share the boilerplate (2 duplicated in-batch);
    // batch 2: doc 3 new + REPLAY of doc 1
    writeBatch("b1", Seq(
      (1L, s"first document body $boiler"),
      (2L, s"second entirely different body $boiler"),
      (2L, s"second entirely different body $boiler")))
    writeBatch("b2", Seq(
      (3L, "third doc shares nothing kumquat zephyr veldt fjord aurora"),
      (1L, s"first document body $boiler")))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.resolve("in").toString)
    val q = StreamOps.winnowIndexIngestStream(stream, idxDir)
      .option("checkpointLocation", dir.resolve("ck").toString).start()
    try {
      q.processAllAvailable()
      // each id indexed exactly once despite the in-batch dup + replay
      val ids = spark.read.parquet(s"$idxDir/fp").select("id")
        .distinct().as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
      // a probe against the LIVE index attributes the shared passage,
      // and matches the batch-mode probe over the same corpus
      val probeDocs = Seq((10L, s"incoming passage check $boiler"))
        .toDF("doc_id", "text")
      val live = graft.text.WinnowIndex.probeBatch(spark, idxDir,
        probeDocs, "doc_id", "text", minShared = 2, maxDocsPerHash = 50)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      assert(live.map(_._1) == Set(1L, 2L))
      val batchDir = dir.resolve("batch_idx").toString
      graft.text.WinnowIndex.ingestBatch(spark, batchDir, Seq(
        (1L, s"first document body $boiler"),
        (2L, s"second entirely different body $boiler"),
        (3L, "third doc shares nothing kumquat zephyr veldt fjord aurora"))
        .toDF("doc_id", "text"), "doc_id", "text")
      val batchProbe = graft.text.WinnowIndex.probeBatch(spark, batchDir,
        probeDocs, "doc_id", "text", minShared = 2, maxDocsPerHash = 50)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      assert(live == batchProbe)
    } finally q.stop()
  }

  test("streaming uniform sample: bottom-k partials merge to the exact batch-mode sample; replays collapse") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_samp_stream_")
    val sampleDir = dir.resolve("sample").toString
    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit = {
      val staging = dir.resolve(s"_s_$name")
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(staging.toString)
      val part = java.nio.file.Files.list(staging)
        .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(part, dir.resolve(s"in/in_$name.parquet"))
    }
    java.nio.file.Files.createDirectories(dir.resolve("in"))
    val all = (0L until 500L).map(i => (i, s"doc body $i"))
    writeBatch("b1", all.take(200))
    writeBatch("b2", all.slice(200, 400))
    writeBatch("b3", all.drop(400))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.resolve("in").toString)
    val q = StreamOps.sampleStream(stream, sampleDir, "doc_id", k = 50)
      .option("checkpointLocation", dir.resolve("ck").toString).start()
    try {
      q.processAllAvailable()
      // partials are k rows per batch, never batch-sized
      import org.apache.spark.sql.functions.{col, concat, input_file_name, lit, md5}
      val partialRows = spark.read.parquet(s"$sampleDir/bk")
        .groupBy(input_file_name()).count().select("count")
        .as[Long].collect()
      assert(partialRows.forall(_ <= 50))
      val streamed = StreamOps.sampleRender(spark, sampleDir, k = 50)
        .select("doc_id").as[Long].collect().sorted.toSeq
      // batch twin: global bottom-50 by the same priority
      val expect = all.toDF("doc_id", "text")
        .withColumn("__pri", md5(concat(lit("samp:"), $"doc_id".cast("string"))))
        .orderBy($"__pri").limit(50)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(streamed == expect)
      // replay: re-delivering batch 0 rewrites its own partial; a
      // cross-batch duplicate id ties on priority and collapses
      StreamOps.sampleIngestBatch(
        (all.take(200) ++ all.slice(200, 210)).toDF("doc_id", "text"),
        sampleDir, batchId = 0L, "doc_id", k = 50)
      val replayed = StreamOps.sampleRender(spark, sampleDir, k = 50)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(replayed == expect)
      // the sample is directly usable: no leaked partition bookkeeping
      assert(!StreamOps.sampleRender(spark, sampleDir, k = 50)
        .columns.contains("batch_id"))
      // k is pinned at ingest: rendering MORE than the partials kept
      // would silently be non-bottom-k, so it throws instead
      val e = intercept[IllegalArgumentException] {
        StreamOps.sampleRender(spark, sampleDir, k = 51)
      }
      assert(e.getMessage.contains("exceeds the ingest-time k"))
      val e2 = intercept[IllegalArgumentException] {
        StreamOps.sampleIngestBatch(all.take(5).toDF("doc_id", "text"),
          sampleDir, batchId = 9L, "doc_id", k = 50, salt = "other")
      }
      assert(e2.getMessage.contains("salt"))
    } finally q.stop()
  }

  test("streaming per-source cap: grouped bottom-k partials merge to the exact batch-mode cap") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, concat, lit, md5, row_number}
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_scap_stream_")
    val sampleDir = dir.resolve("sample").toString
    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit = {
      val staging = dir.resolve(s"_s_$name")
      rows.toDF("doc_id", "source").coalesce(1).write.parquet(staging.toString)
      val part = java.nio.file.Files.list(staging)
        .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(part, dir.resolve(s"in/in_$name.parquet"))
    }
    java.nio.file.Files.createDirectories(dir.resolve("in"))
    val all = (0L until 300L).map(i => (i, s"src${i % 3}"))
    writeBatch("b1", all.take(150))
    writeBatch("b2", all.drop(150))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("source", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.resolve("in").toString)
    val q = StreamOps.sampleByStream(stream, sampleDir, "source",
        "doc_id", k = 10)
      .option("checkpointLocation", dir.resolve("ck").toString).start()
    try {
      q.processAllAvailable()
      val streamed = StreamOps.sampleByRender(spark, sampleDir, "source", k = 10)
        .select("doc_id").as[Long].collect().sorted.toSeq
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(md5(concat(lit("samp:"), col("doc_id").cast("string"))))
      val expect = all.toDF("doc_id", "source")
        .withColumn("__rn", row_number().over(w)).where(col("__rn") <= 10)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(streamed == expect && streamed.size == 30)
    } finally q.stop()
  }

  test("streaming bitext mining: align + mine per batch equals the batch composition; replays rewrite") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_bitext_stream_")
    val outDir = dir.resolve("mined").toString
    def vec(seed: Int): Array[Float] = {
      val rng = new scala.util.Random(seed)
      val v = Array.fill(8)(rng.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    // planted rotation: the target side lives in a rotated space; the
    // frozen Procrustes map (here: the exact rotation) aligns sources
    val r0 = graft.vec.Align.givens(8, Seq((0, 1, 0.7), (2, 3, 1.3)))
    val tgtRaw = (100L until 120L).map(i => (i, vec((i % 50).toInt)))
      .toDF("vec_id", "embedding")
    val tgt = graft.vec.Align.applyMap(tgtRaw, "embedding", "__r", r0)
      .select($"vec_id", $"__r".as("embedding")).localCheckpoint()
    def writeBatch(name: String, rows: Seq[(Long, Array[Float])]): Unit = {
      val staging = dir.resolve(s"_s_$name")
      rows.toDF("vec_id", "embedding").coalesce(1).write.parquet(staging.toString)
      val part = java.nio.file.Files.list(staging)
        .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(part, dir.resolve(s"in/in_$name.parquet"))
    }
    java.nio.file.Files.createDirectories(dir.resolve("in"))
    val b1 = (0L until 8L).map(i => (i, vec(i.toInt)))
    val b2 = (8L until 16L).map(i => (i, vec(i.toInt)))
    writeBatch("b1", b1)
    writeBatch("b2", b2)
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.resolve("in").toString)
    val q = StreamOps.bitextMineStream(stream, tgt, r0, outDir)
      .option("checkpointLocation", dir.resolve("ck").toString).start()
    try {
      q.processAllAvailable()
      val streamed = StreamOps.bitextPairsRender(spark, outDir)
        .select("src_id", "tgt_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch twin: the same per-batch align+mine calls
      def mineBatch(rows: Seq[(Long, Array[Float])]) = {
        val aligned = graft.vec.Align.applyMap(
            rows.toDF("vec_id", "embedding"), "embedding", "__a", r0)
          .select($"vec_id", $"__a".as("embedding"))
        graft.vec.Bitext.minePairs(aligned, tgt, "vec_id", "embedding",
            k = 4, minMargin = 1.0)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      assert(streamed == (mineBatch(b1) ++ mineBatch(b2)))
      assert(streamed.nonEmpty,
        "planted rotation must yield at least one mutual-best pair")
      // replay: re-delivering batch 0 rewrites its own partial — the
      // accumulated pair set is unchanged
      StreamOps.bitextMineIngestBatch(b1.toDF("vec_id", "embedding"),
        tgt, r0, outDir, batchId = 0L)
      val replayed = StreamOps.bitextPairsRender(spark, outDir)
        .select("src_id", "tgt_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(replayed == streamed)
    } finally q.stop()
  }

  test("curation pipeline in SKETCH mode: full stream + restart; exact columns match the batch twin, dup_ratio bounded, card fp state KB-sized") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val dir = java.nio.file.Files.createTempDirectory("graft_cursketch_")
    val srcDir = java.nio.file.Files.createDirectories(dir.resolve("src"))
    val ckpt = dir.resolve("ck").toString
    val pipeDir = dir.resolve("pipe").toString
    def mkDocs(ids: Seq[Long]) = ids.map { i =>
      val body = if (i % 6 == 0) "the forbidden benchmark passage appears right here today"
        else if (i % 3 == 0) "one shared duplicate body for the dedup stage to collapse."
        else s"unique clean document $i about topic ${i % 4} with several words."
      (i, body, "en", if (i % 2 == 0) "web" else "books")
    }.toDF("doc_id", "text", "lang", "source")
    def writeFile(ids: Seq[Long], name: String): Unit = {
      val staging = dir.resolve(s"_s$name")
      mkDocs(ids).coalesce(1).write.parquet(staging.toString)
      val part = java.nio.file.Files.list(staging)
        .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(part, srcDir.resolve(s"$name.parquet")): Unit
    }
    val bench = Seq("the forbidden benchmark passage appears right here today")
      .toDF("text")
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType),
      StructField("source", StringType)))
    def run(): Unit = {
      val docs = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
      val q = graft.streaming.StreamOps.curationPipelineStream(
          docs, pipeDir, bench, "text", n = 3, capK = 5,
          dupSketch = true) // the deployed configuration under test
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    writeFile(1L to 12L, "d0")
    run()
    writeFile(13L to 24L, "d1")
    run() // checkpoint restart, second half
    val render = graft.streaming.StreamOps.curationRender(spark, pipeDir,
      capK = 5).localCheckpoint()
    // layout: the card's fp state is per-source sketches, never per-doc
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(pipeDir, "card", "fps_hll")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(pipeDir, "card", "fps")),
      "sketch mode must not accumulate per-doc fingerprint partials")
    val hllBytes = {
      val s = java.nio.file.Files.walk(
        java.nio.file.Paths.get(pipeDir, "card", "fps_hll"))
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
    assert(hllBytes > 0 && hllBytes < 256L * 1024,
      s"fps_hll partials should be KB-sized, got $hllBytes bytes")
    // every column except dup_ratio is EXACT and must equal the batch
    // twin; dup_ratio is sketch-approximate with a small absolute error
    val all = mkDocs(1L to 24L)
    val decon = graft.text.TextOps.decontaminateNgramOverlap(
      all, bench, "doc_id", "text", "text", n = 3).localCheckpoint()
    val card = graft.text.DataCard.perSource(decon, "doc_id", "text",
      "lang", "source")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy(md5(concat(lit("samp:"), $"doc_id".cast("string"))))
    val cap = decon.withColumn("__rn", row_number().over(w)).where($"__rn" <= 5)
      .groupBy($"source").agg(count(lit(1)).cast("long").as("cap_n"),
        min($"doc_id").as("cap_min_doc"))
    val corpusDocs = decon
      .select(graft.text.TextOps.fingerprintMd5($"text")).distinct().count()
    val expect = card.join(cap, "source")
      .withColumn("corpus_docs", lit(corpusDocs)).localCheckpoint()
    val exactCols = render.columns.filterNot(_ == "dup_ratio").toSeq
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(exactCols.map(col): _*).collect().map(_.toSeq).toSet
    assert(rows(render) == rows(expect) && render.count() == 2L)
    val dupErr = render.select($"source", $"dup_ratio")
      .join(expect.select($"source", $"dup_ratio".as("__exact")), "source")
      .select(max(abs($"dup_ratio" - $"__exact"))).head().getDouble(0)
    assert(dupErr <= 0.05, s"sketch dup_ratio drifted: max abs error $dupErr")
    // replaying the last batch id rewrites its own sketch partial — the
    // render must be unchanged (idempotent partials discipline)
    val lastBatch = graft.streaming.StreamOps.decontaminateStream(
      mkDocs(13L to 24L), bench, "text", "text", n = 3)
    graft.streaming.StreamOps.dataCardIngestBatch(lastBatch,
      s"$pipeDir/card", 1L, dupSketch = true)
    val again = graft.streaming.StreamOps.curationRender(spark, pipeDir, capK = 5)
    assert(rows(again) == rows(expect))
  }

  test("curation pipeline in NEAR-dup mode: DedupIndex-backed corpus stage across a restart; replay absorbed; compaction invisible") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val dir = java.nio.file.Files.createTempDirectory("graft_curnear_")
    val srcDir = java.nio.file.Files.createDirectories(dir.resolve("src"))
    val ckpt = dir.resolve("ck").toString
    val pipeDir = dir.resolve("pipe").toString
    val benchText = "the forbidden benchmark passage appears right here today"
    def body(i: Long): String = i match {
      case 2L  => body(1L) // exact dup IN batch 1 -> collapsed
      case 6L  => benchText // decontaminated away
      case 11L => body(3L) // exact dup ACROSS batches -> fp probe drops
      case 12L => body(4L) + " added" // near dup (J~0.82) of an admitted doc -> verify drops
      case 16L => benchText
      case 13L => "one common body shared by two odd documents here"
      case 14L => "one common body shared by two odd documents here different"
        // 13/14 near-dup EACH OTHER inside batch 2: candidates come
        // only from the index, so both are admitted — batch semantics
      case i   =>
        // filler docs share NO shingle across ids (every 3-gram carries
        // an id-specific token), so the only near-dup pairs are the
        // constructed high-J ones — keeps the expectation deterministic
        // (banding recall at threshold-grazing J=0.5 is not total)
        s"document number $i carries tok${i}a tok${i}b tok${i}c tok${i}d tok${i}e trailing words"
    }
    def mkDocs(ids: Seq[Long]) = ids.map(i =>
      (i, body(i), "en", if (i % 2 == 0) "web" else "books"))
      .toDF("doc_id", "text", "lang", "source")
    def writeFile(ids: Seq[Long], name: String): Unit = {
      val staging = dir.resolve(s"_s$name")
      mkDocs(ids).coalesce(1).write.parquet(staging.toString)
      val part = java.nio.file.Files.list(staging)
        .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(part, srcDir.resolve(s"$name.parquet")): Unit
    }
    val bench = Seq(benchText).toDF("text")
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType),
      StructField("source", StringType)))
    val params = graft.text.DedupIndex.Params()
    def run(): Unit = {
      val docs = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
      // the full deployed configuration: sketch card + near-dup corpus
      // (the two beyond-default modes compose — independent stages)
      val q = graft.streaming.StreamOps.curationPipelineStream(
          docs, pipeDir, bench, "text", n = 3, capK = 5,
          dupSketch = true, nearDedup = Some(params))
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    // the first half lands as TWO micro-batches so compaction below has
    // >= 2 foldable subdirs under the max batch id (the fold contract);
    // the exact-dup pair (1, 2) drops identically whether the pair
    // shares a batch or crosses one — the fp probe owns both cases
    writeFile(1L to 4L, "d0a")
    writeFile(5L to 8L, "d0b")
    run()
    writeFile(11L to 18L, "d1")
    run() // checkpoint restart: the odd half probes the seeded index
    def corpusIds() = spark.read.parquet(s"$pipeDir/corpus")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val expected = Set(1L, 3L, 4L, 5L, 7L, 8L, 13L, 14L, 15L, 17L, 18L)
    assert(corpusIds() == expected)
    // a crash replay of batch 2 re-probes and appends NOTHING
    val replay = graft.streaming.StreamOps.decontaminateStream(
      mkDocs(11L to 18L), bench, "text", "text", n = 3)
    assert(graft.text.DedupIndex.ingestBatch(replay, s"$pipeDir/corpus",
      s"$pipeDir/dedup_idx", params = params) == 0L)
    // maintenance: folds partials + the (unsorted) corpus + the index's
    // per-batch files; render and admitted set must be unchanged
    val renderBefore = graft.streaming.StreamOps.curationRender(
      spark, pipeDir, capK = 5).collect().map(_.toSeq).toSet
    val (folded, files) = graft.streaming.StreamOps.curationCompact(spark, pipeDir)
    assert(folded > 0, "partials should have folded across two batches")
    assert(files >= 0) // tiny corpora may already be at the target
    assert(corpusIds() == expected)
    assert(graft.streaming.StreamOps.curationRender(spark, pipeDir, capK = 5)
      .collect().map(_.toSeq).toSet == renderBefore)
    // the index survives compaction: replays still absorb, and a fresh
    // near-dup of an admitted doc is still dropped
    assert(graft.text.DedupIndex.ingestBatch(replay, s"$pipeDir/corpus",
      s"$pipeDir/dedup_idx", params = params) == 0L)
    val fresh = Seq((21L, body(5L) + " added", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    assert(graft.text.DedupIndex.ingestBatch(fresh, s"$pipeDir/corpus",
      s"$pipeDir/dedup_idx", params = params) == 0L)
    assert(corpusIds() == expected)
  }

  test("maintenance policy: due at the threshold, no-op below, refused while the pipeline's named query is active") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_maint_")
    val pipeDir = dir.resolve("pipe").toString
    def mkBatch(ids: Seq[Long]) = ids.map(i =>
      (i, s"maintenance test document $i with words", "en",
        if (i % 2 == 0) "web" else "books"))
      .toDF("doc_id", "text", "lang", "source")
    // three direct batch ingests = three batch_id subdirs per family
    (0L to 2L).foreach { b =>
      val batch = mkBatch((b * 4 + 1) to (b * 4 + 4))
      graft.streaming.StreamOps.dataCardIngestBatch(batch, s"$pipeDir/card", b)
      graft.streaming.StreamOps.sampleByIngestBatch(batch, s"$pipeDir/cap", b,
        "source", "doc_id", k = 5)
      graft.streaming.StreamOps.fpDedupIngestBatch(batch, s"$pipeDir/corpus"): Unit
    }
    def due(maxSubdirs: Int) = graft.streaming.StreamOps
      .maintenanceDue(spark, pipeDir, maxSubdirs = maxSubdirs, maxFiles = 999)
      .where($"due").select($"component").collect().map(_.getString(0)).toSet
    // below threshold: nothing due, the hook is a strict no-op
    assert(due(maxSubdirs = 5).isEmpty)
    assert(graft.streaming.StreamOps.curationCompactIfDue(spark, pipeDir,
      maxSubdirs = 5, maxFiles = 999) == ((0, 0)))
    def subdirs(rel: String) = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(pipeDir, rel))
      try s.filter(_.getFileName.toString.startsWith("batch_id=")).count()
      finally s.close()
    }
    assert(subdirs("card/stats") == 3, "no-op must leave partials untouched")
    // at the threshold: the partials families report due and the hook acts
    assert(due(maxSubdirs = 3).contains("card/stats"))
    val (folded, _) = graft.streaming.StreamOps.curationCompactIfDue(
      spark, pipeDir, maxSubdirs = 3, maxFiles = 999)
    assert(folded > 0)
    assert(subdirs("card/stats") == 2) // base + preserved max id
    // post-compaction the policy is satisfied again — the hook re-arms
    assert(due(maxSubdirs = 3).isEmpty)
    assert(graft.streaming.StreamOps.curationCompactIfDue(spark, pipeDir,
      maxSubdirs = 3, maxFiles = 999) == ((0, 0)))
    // ENFORCED non-concurrency: while a query carrying the pipeline's
    // name runs, every maintenance verb refuses
    val guard = spark.readStream.format("rate")
      .option("rowsPerSecond", "1").load()
      .writeStream.format("noop")
      .queryName(graft.streaming.StreamOps.curationQueryName(pipeDir))
      .start()
    try {
      intercept[IllegalStateException] {
        graft.streaming.StreamOps.curationCompact(spark, pipeDir)
      }
      intercept[IllegalStateException] {
        graft.streaming.StreamOps.curationCompactIfDue(spark, pipeDir)
      }
    } finally guard.stop()
    // quiesced again: the verb works (nothing due -> no-op)
    assert(graft.streaming.StreamOps.curationCompactIfDue(spark, pipeDir,
      maxSubdirs = 3, maxFiles = 999) == ((0, 0)))
  }

  test("curationCompact heals a crashed corpus swap BEFORE probing its layout") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_curheal_")
    val pipeDir = dir.resolve("pipe").toString
    def mkBatch(ids: Seq[Long]) = ids.map(i =>
      (i, s"compact heal document $i with words", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    (0L to 2L).foreach { b =>
      val batch = mkBatch((b * 4 + 1) to (b * 4 + 4))
      graft.streaming.StreamOps.dataCardIngestBatch(batch, s"$pipeDir/card", b)
      graft.streaming.StreamOps.sampleByIngestBatch(batch, s"$pipeDir/cap", b,
        "source", "doc_id", k = 5)
      graft.streaming.StreamOps.fpDedupIngestBatch(batch, s"$pipeDir/corpus"): Unit
    }
    val before = graft.streaming.StreamOps.curationRender(spark, pipeDir,
      capK = 5).collect().map(_.toSeq).toSet
    // a compactCorpus crash mid-swap: live renamed aside, nothing
    // installed — the EXACT-mode corpus (with its __fp column) is only
    // visible after the heal; probing the missing live dir first would
    // mis-detect it as sortless and fold it unsorted
    java.nio.file.Files.move(
      java.nio.file.Paths.get(pipeDir, "corpus"),
      java.nio.file.Paths.get(pipeDir, "corpus__old"))
    graft.streaming.StreamOps.curationCompact(spark, pipeDir)
    assert(spark.read.parquet(s"$pipeDir/corpus").columns.contains("__fp"),
      "heal must restore the exact-mode corpus before layout detection")
    assert(graft.streaming.StreamOps.curationRender(spark, pipeDir, capK = 5)
      .collect().map(_.toSeq).toSet == before)
  }

  test("hidden-ancestor filter: a mid-write task-attempt file neither unwedges the presence gate nor inflates the compaction count") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_hidanc_")
    val corpus = dir.resolve("corpus").toString
    // a crash that killed a task MID-write: the attempt file carries a
    // committed-looking final name but lives under _temporary — the
    // presence gate must still answer "no data" (reading the dir as
    // parquet ignores the subtree and would throw on every replay)
    def plantAttempt(): java.nio.file.Path = {
      val attempt = java.nio.file.Paths.get(corpus,
        "_temporary", "0", "_temporary", "attempt_202608161200_0001_m_000000_1")
      java.nio.file.Files.createDirectories(attempt)
      java.nio.file.Files.write(
        attempt.resolve("part-00000-dead.c000.snappy.parquet"),
        "not really parquet".getBytes("UTF-8"))
    }
    plantAttempt()
    def batch(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    assert(graft.streaming.StreamOps.fpDedupIngestBatch(
      batch(Seq(1L -> "alpha body", 2L -> "beta body")), corpus) == 2L)
    assert(spark.read.parquet(corpus).count() == 2L)
    // the committer cleans _temporary on job commit; plant a NEW orphan
    // (a later crashed append) and count committed files directly
    val orphan = plantAttempt()
    def committedParts() = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(corpus))
      try s.filter { p =>
        p.getFileName.toString.startsWith("part-") &&
          !p.toString.contains("_temporary")
      }.count()
      finally s.close()
    }
    val nCommitted = committedParts().toInt
    assert(java.nio.file.Files.exists(orphan.getParent), "orphan must persist")
    // compactCorpus counts COMMITTED files only: at target == committed
    // count it must be a no-op even though the orphan is on disk
    assert(graft.streaming.StreamOps.compactCorpus(spark, corpus,
      targetFiles = nCommitted) == 0)
    // ScanPrune.columnBytes must not open the orphan either (it is not
    // parquet — without the ancestor filter the footer read would throw)
    val fpBytes = graft.ops.ScanPrune.columnBytes(spark, corpus, "__fp")
    assert(fpBytes > 0L)
    // and replays still absorb with the orphan present
    assert(graft.streaming.StreamOps.fpDedupIngestBatch(
      batch(Seq(3L -> "alpha body")), corpus) == 0L)
  }

  test("sample params pin: a deleted-and-recreated sample dir re-pins instead of validating against the stale cached pin") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sparams_")
    val sample = dir.resolve("s").toString
    def batch = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    graft.streaming.StreamOps.sampleIngestBatch(batch, sample, 0L,
      k = 2, salt = "s1")
    // same-dir mismatch is still refused (the pin works)
    intercept[IllegalArgumentException] {
      graft.streaming.StreamOps.sampleIngestBatch(batch, sample, 1L,
        k = 3, salt = "s1")
    }
    // delete and RECREATE with different (k, salt) in the same JVM — a
    // long-lived server must re-pin against the new dir, not validate
    // against the dead dir's cached pin
    val hp = new org.apache.hadoop.fs.Path(sample)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    graft.streaming.StreamOps.sampleIngestBatch(batch, sample, 0L,
      k = 3, salt = "s2")
    assert(graft.streaming.StreamOps.sampleRender(spark, sample, k = 3)
      .count() == 3L)
    // and the NEW pin enforces from the cache path too
    intercept[IllegalArgumentException] {
      graft.streaming.StreamOps.sampleIngestBatch(batch, sample, 1L,
        k = 2, salt = "s1")
    }
  }

  test("writer lease: maintenance refuses under a live foreign lease, reclaims a stale one; acquire is exclusive") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_lease_")
    val pipeDir = dir.resolve("pipe").toString
    val batch = Seq((1L, "lease test document body", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    graft.streaming.StreamOps.dataCardIngestBatch(batch, s"$pipeDir/card", 0L)
    graft.streaming.StreamOps.fpDedupIngestBatch(batch, s"$pipeDir/corpus"): Unit
    // simulate a SECOND Spark process streaming this pipeline: its live
    // lease marker exists but NO query is active in THIS JVM — exactly
    // the case the in-JVM named-query check cannot see
    val lease = java.nio.file.Paths.get(pipeDir, "_lease")
    java.nio.file.Files.write(lease, "99999@other-host".getBytes("UTF-8"))
    val e = intercept[IllegalStateException] {
      graft.streaming.StreamOps.curationCompact(spark, pipeDir)
    }
    assert(e.getMessage.contains("another process"))
    intercept[IllegalStateException] {
      graft.streaming.StreamOps.curationCompactIfDue(spark, pipeDir)
    }
    // a second WRITER is refused too (single-writer contract)
    intercept[IllegalStateException] {
      graft.streaming.StreamOps.acquireLease(spark, pipeDir)
    }
    assert(java.nio.file.Files.readAllLines(lease).get(0)
      .contains("other-host"), "a refused acquire must not clobber the holder")
    // stale lease (crashed writer): heartbeat beyond the TTL — every
    // verb reclaims it loudly and proceeds
    java.nio.file.Files.setLastModifiedTime(lease,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - graft.streaming.StreamOps.LeaseTtlMs - 60000L))
    assert(graft.streaming.StreamOps.curationCompactIfDue(spark, pipeDir,
      maxSubdirs = 999, maxFiles = 999) == ((0, 0)))
    assert(!java.nio.file.Files.exists(lease), "stale lease must be reclaimed")
    // a fresh acquire now succeeds; release is idempotent
    graft.streaming.StreamOps.acquireLease(spark, pipeDir)
    assert(java.nio.file.Files.exists(lease))
    intercept[IllegalStateException] {
      graft.streaming.StreamOps.acquireLease(spark, pipeDir)
    }
    graft.streaming.StreamOps.releaseLease(spark, pipeDir)
    graft.streaming.StreamOps.releaseLease(spark, pipeDir)
    assert(!java.nio.file.Files.exists(lease))
    // a stale lease is also reclaimable by a NEW writer, not just by
    // maintenance (crash-restart without waiting out maintenance)
    java.nio.file.Files.write(lease, "99999@other-host".getBytes("UTF-8"))
    java.nio.file.Files.setLastModifiedTime(lease,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - graft.streaming.StreamOps.LeaseTtlMs - 60000L))
    graft.streaming.StreamOps.acquireLease(spark, pipeDir)
    graft.streaming.StreamOps.releaseLease(spark, pipeDir)
  }

  test("managed pipeline start: lease held and refreshed while the query runs; auto-compact fires once after stop when due; render unchanged") {
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val dir = java.nio.file.Files.createTempDirectory("graft_managed_")
    val srcDir = java.nio.file.Files.createDirectories(dir.resolve("src"))
    val pipeDir = dir.resolve("pipe").toString
    val ckpt = dir.resolve("ck").toString
    def mkDocs(ids: Seq[Long]) = ids.map(i =>
      (i, s"managed pipeline document $i with tok${i}a tok${i}b words", "en",
        if (i % 2 == 0) "web" else "books"))
      .toDF("doc_id", "text", "lang", "source")
    def writeFile(ids: Seq[Long], name: String): Unit = {
      val staging = dir.resolve(s"_s$name")
      mkDocs(ids).coalesce(1).write.parquet(staging.toString)
      val part = java.nio.file.Files.list(staging)
        .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(part, srcDir.resolve(s"$name.parquet")): Unit
    }
    // three files -> three micro-batches -> three batch_id subdirs per
    // family: compactable (fold keeps base + preserved max id = 2)
    writeFile(1L to 3L, "f1"); writeFile(4L to 6L, "f2"); writeFile(7L to 9L, "f3")
    val bench = Seq("totally unrelated benchmark passage").toDF("text")
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType),
      StructField("source", StringType)))
    val docs = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
    val lease = java.nio.file.Paths.get(pipeDir, "_lease")
    // maxSubdirs = 3 makes the three-subdir families DUE at stop
    val q = graft.streaming.StreamOps.curationPipelineStart(
      docs, pipeDir, bench, ckpt, "text", n = 3, capK = 5,
      maxSubdirs = 3, maxFiles = 999)
    val renderBefore = try {
      q.processAllAvailable()
      assert(java.nio.file.Files.exists(lease),
        "the managed writer must hold the lease while the query runs")
      // never while active: in-JVM name AND lease both refuse
      intercept[IllegalStateException] {
        graft.streaming.StreamOps.curationCompact(spark, pipeDir)
      }
      graft.streaming.StreamOps.curationRender(spark, pipeDir, capK = 5)
        .collect().map(_.toSeq).toSet
    } finally q.stop()
    // the termination listener is async; the compact runs UNDER the
    // still-held lease and the release is the all-clear — poll for it
    def subdirs(rel: String) = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(pipeDir, rel))
      try s.filter(_.getFileName.toString.startsWith("batch_id=")).count()
      finally s.close()
    }
    val deadline = System.currentTimeMillis() + 60000L
    while (java.nio.file.Files.exists(lease) &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(100L)
    assert(!java.nio.file.Files.exists(lease),
      "termination must release the lease")
    assert(subdirs("card/stats") == 2,
      "auto-compact must fold the due partials after stop")
    // compaction is maintenance: the render is unchanged
    assert(graft.streaming.StreamOps.curationRender(spark, pipeDir, capK = 5)
      .collect().map(_.toSeq).toSet == renderBefore)
    // policy satisfied -> the hook fired once and re-armed: nothing due
    assert(graft.streaming.StreamOps.maintenanceDue(spark, pipeDir,
      maxSubdirs = 3, maxFiles = 999)
      .where($"due").count() == 0L)
  }

  test("zombie-writer fencing: a managed writer whose lease was reclaimed aborts within one batch and never touches the new holder's marker") {
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val dir = java.nio.file.Files.createTempDirectory("graft_fence_")
    val srcDir = java.nio.file.Files.createDirectories(dir.resolve("src"))
    val pipeDir = dir.resolve("pipe").toString
    val ckpt = dir.resolve("ck").toString
    def mkDocs(ids: Seq[Long]) = ids.map(i =>
      (i, s"fencing document $i with tok${i}a tok${i}b words", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    def writeFile(ids: Seq[Long], name: String): Unit = {
      val staging = dir.resolve(s"_s$name")
      mkDocs(ids).coalesce(1).write.parquet(staging.toString)
      val part = java.nio.file.Files.list(staging)
        .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(part, srcDir.resolve(s"$name.parquet")): Unit
    }
    writeFile(1L to 3L, "f1")
    val bench = Seq("totally unrelated benchmark passage").toDF("text")
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType),
      StructField("source", StringType)))
    val docs = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
    val leaseP = new org.apache.hadoop.fs.Path(s"$pipeDir/_lease")
    val fs = leaseP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val q = graft.streaming.StreamOps.curationPipelineStart(
      docs, pipeDir, bench, ckpt, "text", n = 3, capK = 5,
      maxSubdirs = 999, maxFiles = 999)
    try {
      q.processAllAvailable()
      assert(fs.exists(leaseP))
      val corpusAfterB1 = spark.read.parquet(s"$pipeDir/corpus").count()
      assert(corpusAfterB1 == 3L)
      // ANOTHER process reclaims the lease (simulating this writer
      // having stalled past the TTL) and installs its own — via the
      // hadoop fs API, exactly as a real reclaimer would (and so the
      // checksum sidecar stays consistent on local fs)
      val out = fs.create(leaseP, true)
      try out.write(
        s"99999@other-host\n${System.currentTimeMillis()}".getBytes("UTF-8"))
      finally out.close()
      // next batch: the fencing check must fail the query BEFORE the
      // zombie appends under the new holder
      writeFile(4L to 6L, "f2")
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("fenced")),
        s"expected the fencing abort, got: ${messages(e).mkString(" | ")}")
      assert(!q.isActive, "the fenced query must be terminated")
      // the zombie never appended: corpus still holds only batch 1
      assert(spark.read.parquet(s"$pipeDir/corpus").count() == corpusAfterB1)
      // the new holder's marker survives the zombie's entire cleanup
      // path (post-termination maintenance refused by the live foreign
      // lease; release is own-only) — poll past the async listener
      Thread.sleep(2000L)
      def holderLine(): String = {
        val in = fs.open(leaseP)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().next()
        finally in.close()
      }
      assert(fs.exists(leaseP) && holderLine().contains("other-host"),
        "the stalled writer's cleanup must not delete the new holder's lease")
      // a restart while the new holder is live refuses up front
      intercept[IllegalStateException] {
        graft.streaming.StreamOps.curationPipelineStart(
          docs, pipeDir, bench, s"$ckpt-2", "text", n = 3, capK = 5)
      }
    } finally { if (q.isActive) q.stop() }
    fs.delete(leaseP, false): Unit
  }

  test("maintenance policy: per-table dedup_idx counts (params excluded) and the byte-aware rule") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bytepol_")
    val pipeDir = dir.resolve("pipe").toString
    // three tiny ingests -> several small committed corpus files and a
    // near-dup index with per-batch files in each table
    (0L until 3L).foreach { b =>
      val batch = Seq((b * 2 + 1, s"byte policy document ${b * 2 + 1} alpha beta gamma delta"),
          (b * 2 + 2, s"byte policy document ${b * 2 + 2} epsilon zeta eta theta"))
        .toDF("doc_id", "text")
      graft.text.DedupIndex.ingestBatch(batch, s"$pipeDir/corpus",
        s"$pipeDir/dedup_idx"): Unit
    }
    def status(targetBytes: Long) = graft.streaming.StreamOps
      .maintenanceDue(spark, pipeDir, maxSubdirs = 999, maxFiles = 999,
        targetBytes = targetBytes)
    // the dedup index reports PER TABLE — the grain compact folds; a
    // lumped count would trip the shared threshold ~3x early and the
    // params part file would add a permanent +1
    val components = status(0L).select($"component").as[String].collect().toSet
    assert(Set("dedup_idx/fp", "dedup_idx/sig", "dedup_idx/bands")
      .subsetOf(components))
    assert(!components.contains("dedup_idx"))
    val fpN = status(0L).where($"component" === "dedup_idx/fp")
      .select($"n").as[Long].head()
    val fpDir = new org.apache.hadoop.fs.Path(s"$pipeDir/dedup_idx/fp")
    assert(fpN == graft.ops.FsPaths.committedPartCount(
      fpDir.getFileSystem(spark.sparkContext.hadoopConfiguration), fpDir))
    // byte rule off by default: KB-sized files do not trip counts-only
    assert(status(0L).where($"due").count() == 0L)
    // with a 1 MB compaction target, multi-file KB-mean tables are due
    val dueByBytes = status(1L << 20).where($"due")
      .select($"component").as[String].collect().toSet
    assert(dueByBytes.contains("corpus"),
      "three KB-sized corpus files against a 1 MB target must be due")
    // partials subdirs never take the byte rule
    assert(!dueByBytes.exists(_.startsWith("card/")))
    // compacting BY the byte target folds the corpus to
    // ceil(bytes/target) = 1 file and each index partition dir to one
    // file — the policy re-arms (n > 1 per leaf dir is part of the
    // rule; the bands table keeps one small file per band_mod dir
    // forever, which is exactly why the rule is per-dir)
    graft.streaming.StreamOps.curationCompact(spark, pipeDir,
      targetBytes = 1L << 20)
    assert(status(1L << 20).where($"due").count() == 0L,
      "a byte-target compaction must satisfy the byte-target policy")
    // the standalone sibling takes the same rule
    assert(graft.text.DedupIndex.maintenanceDue(spark, s"$pipeDir/dedup_idx",
      maxFiles = 999, targetBytes = 0L).where($"due").count() == 0L)
  }

  test("decontaminateStream: maxExactGrams = Int.MaxValue force-exact instead of overflowing the gate; negative refused") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "clean text right here"))
      .toDF("doc_id", "text")
    val bench = Seq("alpha beta gamma").toDF("text")
    val out = graft.streaming.StreamOps.decontaminateStream(
      docs, bench, "text", "text", n = 3, maxExactGrams = Int.MaxValue)
    assert(out.select($"doc_id").as[Long].collect().toSet == Set(2L))
    intercept[IllegalArgumentException] {
      graft.streaming.StreamOps.decontaminateStream(
        docs, bench, "text", "text", n = 3, maxExactGrams = -1)
    }
  }
}
