package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.{Winnow, WinnowIndex}

/** Dev tool: probe cost of passage attribution, indexed vs
  * scan-everything, as the accumulated corpus grows. The claim under
  * test: [[Winnow.overlap]] re-fingerprints the WHOLE corpus on every
  * run (per-probe cost grows with the corpus), while
  * [[WinnowIndex.probeBatch]] stays ~flat (fingerprint the small batch
  * + a mod-pruned join against the persisted fingerprint table).
  * Synthesizes nRounds growth steps of docsPerStep docs (each doc
  * carries a shared boilerplate passage so probes find real overlap),
  * after each step probes with a FIXED 100-doc batch through both
  * paths, prints per-probe seconds. Recorded in COVERAGE.md.
  * Usage: graft.dev.WinnowProbeFlatness [nRounds] [docsPerStep] [modes]
  */
object WinnowProbeFlatness {
  def main(args: Array[String]): Unit = {
    val nRounds = args.lift(0).map(_.toInt).getOrElse(5)
    val perStep = args.lift(1).map(_.toInt).getOrElse(10000)
    val modes = args.lift(2).getOrElse("indexed,scan").split(",").map(_.trim).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // each doc shares its footer passage with its 500-doc window ONLY,
    // so the probe batch (window-0 footers) matches a BOUNDED set of
    // corpus docs no matter how large the corpus grows — the realistic
    // shape (a batch overlaps some docs, not the whole corpus; the
    // whole-corpus-boilerplate case is what maxDocsPerHash caps)
    def docsDf(start: Long, n: Long) =
      spark.range(start, start + n).toDF("doc_id")
        .withColumn("text", concat(
          lit("unique lead section number "), col("doc_id"),
          lit(" about topic "), pmod(col("doc_id"), lit(97)),
          lit(" followed by the window footer passage "),
          lit("shared verbatim inside window number "),
          (col("doc_id") / 500).cast("long"),
          lit(" subscribe to the newsletter of this window")))

    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_widx_probe_").toString + "/idx"
    // fixed probe batch: disjoint ids, but window-0 footers — its true
    // match set is the 500 window-0 corpus docs, constant forever
    val batch = spark.range(0L, 100L)
      .select((col("id") + 10000000L).as("doc_id"),
        concat(lit("incoming doc "), col("id"),
          lit(" followed by the window footer passage "),
          lit("shared verbatim inside window number "), lit(0L),
          lit(" subscribe to the newsletter of this window")).as("text"))
    // NOT checkpointed: the per-round unpersist below would drop its
    // blocks and a truncated lineage cannot recompute; the frame is a
    // trivial range projection anyway

    println(f"${"round"}%-6s ${"corpus"}%-9s ${"ingest_s"}%-9s ${"indexed_s"}%-10s scan_s")
    (1 to nRounds).foreach { r =>
      val step = docsDf((r - 1).toLong * perStep, perStep).localCheckpoint()
      def time(f: => Long): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      // ingest a FIXED-size step each round: flat ingest_s as the index
      // grows is the claim under test for the manifest-based replay
      // dedup (the old fp.id.distinct() form grew with the corpus)
      val tg = time(WinnowIndex.ingestBatch(spark, idxDir, step, "doc_id", "text"))
      val corpusSoFar = docsDf(0, r.toLong * perStep)
      // maxDocsPerHash = 600: keeps every true window match (500-doc
      // windows) while capping the synthetic footer's corpus-wide
      // 8-char grams — with the cap DISABLED those grams join every
      // corpus doc against every batch doc (a deliberate boilerplate
      // blowup the cap exists to stop) and the measurement degrades to
      // the quadratic pair expansion instead of the probe's real cost
      val ti = if (modes.contains("indexed"))
        time(WinnowIndex.probeBatch(spark, idxDir, batch,
          "doc_id", "text", minShared = 1, maxDocsPerHash = 600).count())
      else -1.0
      val ts = if (modes.contains("scan"))
        time(Winnow.overlap(corpusSoFar.union(batch), "doc_id", "text",
          minShared = 1, maxDocsPerHash = 600)
          .where(col("right_id") >= 10000000L || col("left_id") >= 10000000L)
          .count())
      else -1.0
      println(f"$r%-6d ${r.toLong * perStep}%-9d $tg%-9.2f $ti%-10.2f $ts%.2f")
      // drop accumulated localCheckpoint blocks (the Bench discipline)
      // so block-manager churn can't masquerade as probe growth
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    // steady-state check: repeated probes at the final corpus size —
    // separates per-probe cost from cross-round session-state growth
    if (modes.contains("indexed")) (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      WinnowIndex.probeBatch(spark, idxDir, batch,
        "doc_id", "text", minShared = 1, maxDocsPerHash = 600).count()
      println(f"rep$i   final     ${(System.nanoTime() - t0) / 1e9}%-10.2f")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
