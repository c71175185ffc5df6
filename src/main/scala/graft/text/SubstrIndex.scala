package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted exact-substring dedup index: the state that makes
  * [[TextOps.dedupSubstrings]] (Lee et al. ACL'22 ExactSubstr,
  * re-expressed distributed) a CONTINUOUS-corpus operation. The batch
  * operator re-grams the whole corpus per run — O(corpus) per batch at
  * ingest cadence, the dominant cost long before 100 TB. This index
  * persists the one thing the corpus side contributes to the compare:
  * the set of `minTokens`-token gram digests already seen, with the doc
  * id of each gram's FIRST occurrence. A batch then cuts against all
  * text ever ingested at the cost of: its own grams (row-local), one
  * in-batch first-occurrence window, and one join against the gram
  * table — which, once the table clears the [[graft.ops.ScanPrune]]
  * size gate, pushes the batch's gram digests as a point-set page
  * filter so only the pages those digests can touch are read. The
  * corpus text itself is never re-read and never shuffled.
  *
  * Layout under `indexDir` (parquet, append-only):
  *  - `params/` one row: (min_tokens) — written at first ingest,
  *    CHECKED on every reopen (cutting with a different window length
  *    against an index built at another would silently produce wrong
  *    cuts, so a mismatch throws);
  *  - `grams/` (gk, id): gk = md5 hex of the gram (128-bit — a 64-bit
  *    key would birthday-collide at trillions of grams, and a collision
  *    here deletes text), id = the first-occurrence doc. Files are
  *    gk-sorted with capped page rows (the ScanPrune discipline, the
  *    same shape as [[DedupIndex]]'s fp table); NOT hive-partitioned: a
  *    batch's gram digests are uniform over the whole key space, so
  *    modulus partitions would prune nothing (unlike the band table's
  *    probe-sparse band hashes) while multiplying the small-file rate.
  *
  * Sequential-ingest semantics equal the batch operator's: with doc ids
  * increasing across batches, "gram seen in an earlier batch OR earlier
  * in this batch" IS the global (id, pos) first-occurrence rule, so
  * ingesting a corpus in any id-ordered batch split and unioning the
  * cut outputs hash-matches `dedupSubstrings` over the whole corpus
  * (oracle-gated as `q_x_substr_index`).
  *
  * Replay safety: the index stores each gram's first-occurrence ID, and
  * the INGEST path marks only FOREIGN hits (`index id != batch id`) —
  * which presumes the ingest id-uniqueness contract (an id seen again
  * IS a replay of the same doc, never a new doc reusing an old id). A
  * replayed batch — even one whose first run crashed mid-append — finds
  * its own grams under its own ids: own hits are kept (not cut) and not
  * re-appended; grams the crash lost are appended; the returned cut is
  * identical. The same own-id rule makes the returned frame safe to
  * evaluate lazily AFTER the append has landed. The pure PROBE path
  * ([[probeBatch]]) deliberately does NOT apply the rule: a probe
  * frame's id space is independent of the corpus's, so an id collision
  * there is coincidence and every index hit counts as a duplicate.
  *
  * Maintenance mirrors the other persisted indexes: per-batch appends
  * accumulate small files; [[maintenanceDue]] reports the fs-metadata
  * policy signal and [[compact]] folds the table back to ~targetBytes
  * gk-sorted files INSIDE [[graft.ops.Lease.withHeld]] (heartbeated
  * through the fold); [[ingestBatch]] heartbeats a held writer lease
  * per batch and self-fences when it lost it.
  */
object SubstrIndex {

  final case class Params(minTokens: Int = 50) {
    require(minTokens >= 2, s"SubstrIndex: minTokens must be >= 2, got $minTokens")
  }

  private def fs(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def hasData(spark: SparkSession, dir: String): Boolean = {
    val (f, p) = fs(spark, dir)
    f.exists(p) && {
      val it = f.listFiles(p, true)
      var found = false
      while (it.hasNext && !found) {
        val st = it.next()
        found = st.getPath.getName.startsWith("part-") &&
          graft.ops.FsPaths.committedUnder(f, p, st.getPath)
      }
      found
    }
  }

  // ------------------------------------------------------------- params pin
  // the DedupIndex discipline: memoized against the params dir's
  // metadata fingerprint so per-batch reopens cost one listStatus, not
  // a parquet read — and an out-of-band rebuild with different params
  // re-pins instead of validating against the dead index.
  private val paramsCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Int, Seq[(String, Long, Long)])]()

  private def paramsFingerprint(spark: SparkSession,
                                indexDir: String): Seq[(String, Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/params")
    graft.ops.FsPaths.dirFingerprint(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def storedParams(spark: SparkSession,
                           indexDir: String): Option[Int] = {
    val fp = paramsFingerprint(spark, indexDir)
    val cached = paramsCache.get(indexDir)
    if (cached != null) {
      if (cached._2 == fp) return Some(cached._1)
      paramsCache.remove(indexDir)
    }
    // a params dir with no COMMITTED data file (a first ingest that
    // crashed mid-pin left _temporary/ or a partial part) is ABSENT,
    // not corrupt: reading it would wedge every later open on an
    // opaque schema-inference error, where the grams table heals from
    // exactly this crash class — checkOrWriteParams clears the residue
    // and re-pins
    if (fp.isEmpty || !hasData(spark, s"$indexDir/params")) None
    else {
      val l = spark.read.parquet(s"$indexDir/params")
        .head().getAs[Int]("min_tokens")
      paramsCache.put(indexDir, (l, fp))
      Some(l)
    }
  }

  private def checkParams(spark: SparkSession, indexDir: String,
                          p: Params): Unit =
    storedParams(spark, indexDir).foreach { stored =>
      require(stored == p.minTokens,
        s"SubstrIndex at $indexDir was built with minTokens = $stored; " +
          s"cutting with ${p.minTokens} would produce wrong cuts")
    }

  private def checkOrWriteParams(spark: SparkSession, indexDir: String,
                                 p: Params): Unit = {
    import spark.implicits._
    storedParams(spark, indexDir) match {
      case Some(stored) =>
        require(stored == p.minTokens,
          s"SubstrIndex at $indexDir was built with minTokens = $stored; " +
            s"cutting with ${p.minTokens} would produce wrong cuts")
      case None =>
        // clear a crashed first pin's residue (uncommitted dir) so the
        // rewrite does not die on "path already exists"
        val (f, _) = fs(spark, indexDir)
        val pdir = new org.apache.hadoop.fs.Path(s"$indexDir/params")
        if (f.exists(pdir)) f.delete(pdir, true): Unit
        Seq(p.minTokens).toDF("min_tokens")
          .coalesce(1).write.parquet(s"$indexDir/params")
        paramsCache.put(indexDir,
          (p.minTokens, paramsFingerprint(spark, indexDir)))
    }
  }

  // ---------------------------------------------------------------- probe

  /** (base, marked, toAppend) for one batch, all CHECKPOINTED where
    * consumed more than once: base = (id, __orig, __toks), marked =
    * duplicated window starts (in-batch rn > 1, plus index hits),
    * toAppend = grams new to the corpus (in-batch firsts absent from
    * the index) with their first-occurrence id.
    *
    * `excludeOwnIds` controls whether an index hit whose stored
    * first-occurrence id EQUALS the probing doc's id counts as a
    * duplicate. The INGEST path must exclude them — that is the replay
    * convergence rule, and it presumes the ingest id-uniqueness
    * contract (every ingested batch carries ids never ingested before;
    * an id seen again IS a replay of the same doc). The pure PROBE path
    * must NOT: a probe frame's id space is independent of the corpus's
    * (an eval set and a training corpus both numbering docs from 1 is
    * the normal case), so an id collision there is coincidence and
    * skipping the hit would silently under-cut the decontamination. */
  private def probeCore(batch: DataFrame, indexDir: String, idCol: String,
                        textCol: String, p: Params, excludeOwnIds: Boolean)
      : (DataFrame, DataFrame, DataFrame) = {
    val spark = batch.sparkSession
    Seq("__orig", "__toks", "__idx_id").foreach(c =>
      require(!batch.columns.contains(c),
        s"SubstrIndex probe: input already has a $c column"))
    val base = batch.select(col(idCol).as("id"), col(textCol).as("__orig"),
      TextOps.tokens(col(textCol)).as("__toks"))
    val grams = batch.select(col(idCol).as("id"),
      posexplode(TextOps.wordShingles(
        TextOps.tokens(col(textCol)), p.minTokens)).as(Seq("pos", "gram")))
      .select(col("id"), col("pos"), md5(col("gram")).as("gk"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("gk")).orderBy(col("id"), col("pos"))
    // checkpoint: consumed by the in-batch marks, the index probe and
    // the append — without truncation each consumer re-grams the batch
    val ranked = grams.withColumn("rn", row_number().over(w))
      .transform(graft.ops.Pins.pin)
    val inBatch = ranked.where(col("rn") > 1).select(col("id"), col("pos"))
    val firsts = ranked.where(col("rn") === 1)
    val gramsDir = s"$indexDir/grams"
    if (!hasData(spark, gramsDir))
      return (base, inBatch, firsts.select(col("gk"), col("id")))
    // one join against the gram table; past the ScanPrune size gate the
    // scan pushes the batch's (bounded, distinct) digest point set so
    // only the pages those digests can touch are read
    val idx = graft.ops.ScanPrune.prunedScanDf(spark, gramsDir,
      spark.read.parquet(gramsDir)
        .select(col("gk"), col("id").as("__idx_id")),
      "gk", firsts.select(col("gk")).distinct())
    // checkpoint: joined feeds marked AND toAppend (and the returned cut
    // evaluates lazily after the append — the own-id rule keeps that
    // correct, the checkpoint keeps it from re-probing)
    val joined = firsts.join(idx, Seq("gk"), "left").transform(graft.ops.Pins.pin)
    val idxHits = joined.where(
      if (excludeOwnIds)
        col("__idx_id").isNotNull && col("__idx_id") =!= col("id")
      else col("__idx_id").isNotNull)
      .select(col("id"), col("pos"))
    val toAppend = joined.where(col("__idx_id").isNull)
      .select(col("gk"), col("id"))
    (base, inBatch.unionByName(idxHits), toAppend)
  }

  /** Cut `batch` against everything ever ingested WITHOUT growing the
    * index — the pure per-batch form (serving-side decontamination of
    * an eval set against a training corpus, dry-run sizing). Output
    * (id, textCol): marked docs reassembled, untouched docs verbatim. */
  def probeBatch(batch: DataFrame, indexDir: String,
                 idCol: String = "doc_id", textCol: String = "text",
                 params: Params = Params()): DataFrame = {
    val spark = batch.sparkSession
    checkParams(spark, indexDir, params)
    val (base, marked, _) = probeCore(batch, indexDir, idCol, textCol,
      params, excludeOwnIds = false)
    TextOps.rebuildFromMarks(base, marked, params.minTokens, textCol)
  }

  /** Cut `batch` against everything ever ingested AND add its new grams
    * to the index: the continuous-ingest form. Appends land BEFORE the
    * cut frame returns; a writer that took the dir's
    * [[graft.ops.Lease]] stays fresh per batch and self-fences when the
    * lease was reclaimed (lease-free callers are untouched). */
  def ingestBatch(batch: DataFrame, indexDir: String,
                  idCol: String = "doc_id", textCol: String = "text",
                  params: Params = Params()): DataFrame = {
    val spark = batch.sparkSession
    graft.ops.Lease.fenceIfLost(spark, indexDir)
    checkOrWriteParams(spark, indexDir, params)
    val (base, marked, toAppend) =
      probeCore(batch, indexDir, idCol, textCol, params,
        excludeOwnIds = true)
    // re-fence at the write boundary: the probe's shuffles and
    // checkpoints sit between the batch-entry fence above and this
    // append — a writer stalled past the TTL in that window must abort
    // HERE, before its zombie append lands under a reclaimed lease
    // (the next-batch fence would fire only after the damage)
    graft.ops.Lease.fenceIfLost(spark, indexDir)
    toAppend.sortWithinPartitions(col("gk"))
      .write.mode("append")
      .option("parquet.page.row.count.limit", graft.ops.ScanPrune.PageRowLimit)
      .parquet(s"$indexDir/grams")
    TextOps.rebuildFromMarks(base, marked, params.minTokens, textCol)
  }

  /** Streaming form: every micro-batch is cut against everything ever
    * ingested ([[ingestBatch]]) and the cut docs land under
    * `outDir/batch_id=<id>` through the shared idempotent-partials
    * write — a replayed batch converges in the index (own-id rule) AND
    * overwrites its own output subdir, so the accumulated `outDir` is
    * exactly one cut row per ingested doc. Read it back with a plain
    * `spark.read.parquet(outDir)`. */
  def ingestStream(docs: DataFrame, indexDir: String, outDir: String,
                   idCol: String = "doc_id", textCol: String = "text",
                   params: Params = Params())
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          graft.streaming.StreamOps.writeBatchPartial(
            ingestBatch(batch, indexDir, idCol, textCol, params),
            outDir, batchId, singleFile = false)
      }

  // ------------------------------------------------------------ maintenance

  /** Is maintenance DUE? fs metadata only — committed part-file counts
    * (and, with a `targetBytes` policy, mean committed file size) of the
    * gram table; the signal [[compact]] resets. */
  def maintenanceDue(spark: SparkSession, indexDir: String,
                     maxFiles: Int = 64,
                     targetBytes: Long = 0L): DataFrame = {
    require(maxFiles >= 1, s"maintenanceDue: maxFiles >= 1, got $maxFiles")
    require(targetBytes >= 0L,
      s"maintenanceDue: targetBytes >= 0, got $targetBytes")
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/grams")
    val perDir = graft.ops.FsPaths.committedPartDirStats(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
    Seq(("grams", perDir.map(_._1).sum, maxFiles.toLong,
      graft.ops.FsPaths.operativeMeanBytes(perDir), targetBytes,
      graft.ops.FsPaths.fileCountDue(perDir, maxFiles, targetBytes)))
      .toDF("component", "n", "threshold", "mean_bytes", "target_bytes", "due")
  }

  /** Fold the gram table back to ~targetBytes gk-sorted files (0 = the
    * 128 MB default), DISTINCT (a crashed ingest's replay converges
    * without re-appending, so duplicates only arise from task-level
    * partial commits — the rewrite heals them durably). Runs HOLDING
    * the durable lease, heartbeated through the fold, so a writer in
    * another process cannot acquire mid-swap. */
  def compact(spark: SparkSession, indexDir: String,
              targetBytes: Long = 0L,
              ttlMs: Long = graft.ops.Lease.DefaultTtlMs)
      : Option[graft.ops.Compaction.CompactionStats] =
    graft.ops.Lease.withHeld(spark, indexDir, ttlMs, "SubstrIndex compact") {
      val tb = if (targetBytes > 0L) targetBytes else 128L << 20
      val dir = s"$indexDir/grams"
      if (hasData(spark, dir))
        Some(graft.ops.Compaction.compact(spark, dir, tb,
          sortBy = Seq("gk"), distinctRows = true))
      else None
    }
}
