package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.ScanPrune

/** Dev tool: evidence for the round-12 exact-dedup CORPUS presence
  * probe — the full-row analogue of [[FpPushdownProbe]]. Builds a
  * corpus in the STEADY-STATE MAINTAINED layout — what
  * `compactCorpus(sortCol = Some("__fp"))` leaves behind: full doc
  * rows, fp-RANGE-partitioned files (disjoint per-file key ranges),
  * fp-sorted within each file, page-capped rows. That is the layout
  * whose pruning the gate decision is about: fresh appends between
  * compacts are batch-sized files whose page counts are small either
  * way, and a round-robin layout (every file spanning the full range)
  * would let a k-key probe touch ~every page — which is exactly why
  * compactCorpus range-partitions under sortCol. At a size where the
  * fp COLUMN clears `ScanPrune.PushMinTableBytes`, runs the ingest's
  * presence check for a trickle batch (half present, half novel):
  *
  *  - plain: the column-pruned full fp scan (the below-gate plan),
  *    timed after a warm-up count so page cache + reader JIT are not
  *    billed to it, and re-timed at the end (A/B/A)
  *  - pushed: the `columnBytes`-gated point-set pushdown (the
  *    above-gate plan), same join shape as production incl. the
  *    broadcast hint on the anti side
  *  - end-to-end: `fpDedupIngestBatch` itself (gates evaluated
  *    inside the production code path)
  *
  * Also prints the two gate measurements (total dir bytes vs fp column
  * bytes) so the gate's reasoning is visible: on a full-row table the
  * fp column is a small fraction of the directory size. */
object CorpusPushdownProbe {
  def main(args: Array[String]): Unit = {
    val nRows = args.lift(0).map(_.toLong).getOrElse(40000000L)
    val nProbe = args.lift(1).map(_.toInt).getOrElse(1000)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_corpus_push_").toString + "/corpus"
    // corpus rows as the ingest writes them: doc columns + __fp, files
    // fp-sorted and page-capped. Text kept short so the build stays
    // tractable; the probe reads only the fp column either way, so the
    // text width affects the GATE arithmetic, not the measured scans.
    spark.range(nRows)
      .select(col("id").as("doc_id"),
        concat(lit("doc body "), col("id").cast("string")).as("text"))
      .withColumn("__fp", graft.text.TextOps.fingerprintMd5(col("text")))
      .repartitionByRange(16, col("__fp"))
      .sortWithinPartitions("__fp")
      .write.mode("overwrite")
      .option("parquet.page.row.count.limit", ScanPrune.PageRowLimit)
      .parquet(dir)
    val dirGb = ScanPrune.tableBytes(spark, dir) / 1e9
    val fpGb = ScanPrune.columnBytes(spark, dir, "__fp") / 1e9
    println(f"[table] $nRows rows, dir=$dirGb%.2f GB, fp column=$fpGb%.2f GB, " +
      f"gate=${fpGb * 1e9 >= ScanPrune.PushMinTableBytes}")
    // trickle batch: half already-present texts, half novel
    val batch = ((0 until nProbe / 2).map(i => (nRows * 10 + i,
        "doc body " + ((i * 104729L) % nRows))) ++
      (0 until nProbe / 2).map(i => (nRows * 20 + i, s"novel body $i")))
      .toDF("doc_id", "text")
    val withFp = batch
      .withColumn("__fp", graft.text.TextOps.fingerprintMd5(col("text")))
      .dropDuplicates("__fp").localCheckpoint()
    val fpScan = spark.read.parquet(dir).select(col("__fp"))
    // warm-up: page cache + parquet reader JIT must not be billed to
    // whichever variant happens to run first
    fpScan.count(): Unit
    def timeAnti(scan: org.apache.spark.sql.DataFrame, tag: String): Long = {
      val t0 = System.nanoTime()
      // the production join shape (StreamOps.fpDedupIngestBatch):
      // broadcast semi to batch-size `present`, broadcast anti back
      val n = withFp.join(
        broadcast(scan.join(broadcast(withFp.select(col("__fp"))),
          Seq("__fp"), "left_semi")),
        Seq("__fp"), "left_anti").count()
      println(f"[$tag%-7s] fresh=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
      n
    }
    val plain = timeAnti(fpScan, "plain")
    val pushed = timeAnti(
      ScanPrune.prunedScanDf(spark, dir, fpScan, "__fp",
        withFp.select(col("__fp")), minTableBytes = 0L), "pushed")
    timeAnti(fpScan, "plain2"): Unit // A/B/A: warm re-run of plain
    assert(plain == pushed, s"pushdown changed the result: $plain vs $pushed")
    // the production path end to end (gates evaluated inside)
    val t0 = System.nanoTime()
    val kept = graft.streaming.StreamOps.fpDedupIngestBatch(batch, dir)
    println(f"[ingest ] kept=$kept time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    assert(kept == plain, s"ingest kept $kept, presence check says $plain")
    spark.stop()
  }
}
