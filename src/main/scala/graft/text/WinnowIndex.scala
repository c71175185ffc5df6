package graft.text

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted winnowing-fingerprint index: incremental passage
  * attribution at corpus scale. [[Winnow.overlap]] re-fingerprints the
  * WHOLE corpus per run — O(corpus) CPU every time a new batch asks
  * "which existing documents share a passage with me?". This index
  * persists the corpus side's fingerprints once, so a batch probe
  * costs: fingerprint the (small) batch + one PRUNED scan of the
  * fingerprint table — the corpus is never re-fingerprinted and its
  * text never read. Same persisted-state discipline as [[DedupIndex]].
  *
  * Layout under `indexDir` (parquet, append-only):
  *  - `params/` one row (k, w, n_mods) — written at first ingest,
  *    CHECKED on reopen: probing with different winnowing parameters
  *    would silently miss shared passages, so a mismatch throws.
  *  - `fp/` partitioned by fp_mod = pmod(hash, n_mods): (hash, id) —
  *    DISTINCT per doc, so an in-doc repeated k-gram cannot multiply
  *    pair counts. Rows are SORTED BY HASH within every file and pages
  *    are capped at [[PageRowLimit]] rows, so parquet column-index
  *    (page-level min/max) stats can skip pages a probe's hash set
  *    cannot touch.
  *  - `ids/` the doc-id manifest: ONE row per indexed document, sorted
  *    by id with page-capped files — the replay-dedup side. Ingest's
  *    already-indexed check reads THIS (corpus-doc-sized, one slim
  *    column, [[graft.ops.ScanPrune]]-prunable to the batch's id pages
  *    once the manifest passes the size gate) instead of distinct-ing
  *    the fp table's id column, which is per-GRAM sized and was a full
  *    corpus shuffle per micro-batch. Backfilled once from fp/ when an
  *    older index is first ingested into.
  *
  * Probe pruning — the sub-linear story: a probe's distinct hash set
  * is batch-sized (driver-collectable; it already had to fit the
  * driver to broadcast). When it holds <= [[MaxPushHashes]] values the
  * probe pushes a BALANCED interval tree of point-equality leaves over
  * the sorted table ([[hashTreePredicate]]): parquet evaluates the
  * tree against per-page min/max stats and reads only pages whose
  * narrow hash range contains a probed value — touched pages are
  * bounded by the PROBE's hash count, not the corpus, so per-probe IO
  * goes flat once the table outgrows |probe hashes| x page rows.
  * Residual (per-row) evaluation of the tree is O(log |hashes|): every
  * internal node carries its subtree's [min,max] guard, so
  * non-matching rows descend one branch and exit. Batches above the
  * cap skip the predicate — a scan that size is amortized by the batch
  * itself, and giant literal trees would blow codegen for no pruning
  * gain (a 5000-point set covers every page of a uniform hash space).
  *
  * Replay safety: [[ingestBatch]] drops batch ids already present in
  * the index (and in-batch duplicates), so a re-delivered batch
  * appends nothing — the vecIndexIngestBatch discipline: the manifest
  * scan rides the broadcast side of two joins (semi vs the broadcast
  * batch ids, then the batch anti vs the broadcast batch-sized
  * `present`), so NOTHING corpus-sized ever shuffles on ingest. A
  * crash between the fp append and the ids append can let one replay
  * re-append its fp rows; duplicates are harmless ([[probeBatch]]
  * dedups its batch-bounded candidate slice) and [[compact]] rewrites
  * fp distinct, healing them durably.
  *
  * Maintenance: appends accumulate one file per (ingest, modulus);
  * [[compact]] rewrites `fp/` into one hash-sorted file per modulus
  * (crash-safe two-rename swap, healed on next open), restoring both
  * the file-count constant and whole-file hash locality.
  */
object WinnowIndex {

  final case class Params(k: Int = 8, w: Int = 4, nMods: Int = 64) {
    require(k >= 1 && w >= 1 && nMods >= 1,
      s"WinnowIndex: bad params (k=$k, w=$w, nMods=$nMods)")
  }

  /** Probe pushdown knobs and the tree itself are the shared
    * [[graft.ops.ScanPrune]] discipline (used by every persisted
    * index). */
  val MaxPushHashes: Int = graft.ops.ScanPrune.MaxPushKeys
  val PushMinTableBytes: Long = graft.ops.ScanPrune.PushMinTableBytes
  val PageRowLimit: Int = graft.ops.ScanPrune.PageRowLimit

  private def fs(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val (f, p) = fs(spark, dir)
    f.exists(p)
  }

  private def hasData(spark: SparkSession, dir: String): Boolean = {
    val (f, p) = fs(spark, dir)
    f.exists(p) && {
      // hidden-ancestor filter: an in-flight `_temporary/.../part-*`
      // attempt must not make an unreadable dir look probe-able
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

  /** The validated params pin, memoized per dir (the DedupIndex /
    * sampleParamsCache discipline): without it every micro-batch ingest
    * and every probe paid a driver parquet-read JOB to re-verify an
    * immutable pin. Revalidated per check against the params dir's
    * metadata fingerprint ([[graft.ops.FsPaths.dirFingerprint]], one
    * driver listStatus) so a deleted-and-recreated index re-pins
    * instead of validating against the dead one — even when the
    * rebuild happened in another process while the dir existed at
    * check time (a bare fs-exists misses that). Single-writer per
    * index by contract. */
  private val paramsCache = new java.util.concurrent.ConcurrentHashMap[
    String, ((Int, Int, Int), Seq[(String, Long, Long)])]()

  private def checkOrWriteParams(spark: SparkSession, indexDir: String,
                                 p: Params): Unit = {
    import spark.implicits._
    val dir = s"$indexDir/params"
    val hp = new org.apache.hadoop.fs.Path(dir)
    val fsys = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def fingerprint() = graft.ops.FsPaths.dirFingerprint(fsys, hp)
    val fpNow = fingerprint()
    val cached = paramsCache.get(indexDir)
    val stored: Option[(Int, Int, Int)] =
      if (cached != null && cached._2 == fpNow) Some(cached._1)
      else {
        if (cached != null) paramsCache.remove(indexDir)
        // a params dir with no COMMITTED file (a first pin that crashed
        // mid-write) is ABSENT, not corrupt — reading it would wedge
        // every later open on a schema-inference error; the None branch
        // clears the residue and re-pins
        if (fpNow.nonEmpty && graft.ops.FsPaths.committedPartCount(fsys, hp) > 0) {
          val r = spark.read.parquet(dir).head()
          val s0 = (r.getAs[Int]("k"), r.getAs[Int]("w"), r.getAs[Int]("n_mods"))
          paramsCache.put(indexDir, (s0, fpNow))
          Some(s0)
        } else None
      }
    stored match {
      case Some(s) =>
        require(s == ((p.k, p.w, p.nMods)),
          s"WinnowIndex at $indexDir was built with (k, w, nMods) = $s; " +
            s"probing with ${(p.k, p.w, p.nMods)} would silently miss passages")
      case None =>
        if (fsys.exists(hp)) fsys.delete(hp, true): Unit
        Seq((p.k, p.w, p.nMods)).toDF("k", "w", "n_mods")
          .coalesce(1).write.parquet(dir)
        paramsCache.put(indexDir, ((p.k, p.w, p.nMods), fingerprint()))
    }
  }

  /** Heal a compact interrupted mid-swap: an orphan `fp__old` is the
    * pre-compact table — restore it if `fp` is gone, else it is a
    * leftover after a completed swap, drop it. An orphan `fp__tmp` is
    * a crashed rewrite's table-sized staging copy — reclaim it here
    * (compact also clears it defensively before rewriting; compact is
    * documented NOT concurrent-safe against opens, so an in-flight
    * rewrite losing its staging dir to a racing open is out of
    * contract, while the disk leak from never reclaiming it is not).
    * Idempotent; called on every open. */
  private def healCompact(spark: SparkSession, indexDir: String): Unit = {
    val (f, _) = fs(spark, indexDir)
    Seq("fp", "ids").foreach { name =>
      val live = new org.apache.hadoop.fs.Path(s"$indexDir/$name")
      val old = new org.apache.hadoop.fs.Path(s"$indexDir/${name}__old")
      val tmp = new org.apache.hadoop.fs.Path(s"$indexDir/${name}__tmp")
      if (f.exists(tmp)) f.delete(tmp, true)
      if (f.exists(old)) {
        // a failed restore must fail LOUDLY: swallowing it would leave
        // no live table and every probe silently returning empty
        // results for an index that has data (compact's restore path
        // requires too)
        if (!f.exists(live)) require(f.rename(old, live),
          s"healCompact: could not restore $old to $live — " +
            "index unreadable until the rename succeeds")
        else f.delete(old, true)
      }: Unit
    }
  }

  /** Distinct (fp_mod, hash, id) fingerprint rows for a batch — the
    * row-local kernel scan + one explode, positions collapsed. */
  private def fpRows(batch: DataFrame, idCol: String, textCol: String,
                     p: Params): DataFrame =
    Winnow.fingerprints(batch, idCol, textCol, p.k, p.w)
      .select(col("hash"), col(idCol).as("id")).distinct()
      .withColumn("fp_mod", pmod(col("hash"), lit(p.nMods.toLong)).cast("int"))

  /** The balanced interval tree — [[graft.ops.ScanPrune]]'s shared
    * point-set predicate. */
  private[graft] def hashTreePredicate(sorted: Array[Long], c: Column,
                                       leaf: Int = 8): Column =
    graft.ops.ScanPrune.pointSetPredicate(sorted, c, leaf)

  /** Probe: for each batch doc, the corpus docs sharing >= `minShared`
    * DISTINCT fingerprint hashes — (batch_id, corpus_id, n_shared).
    * The batch's fingerprints are computed ONCE and collected (they
    * are batch-sized and fed every broadcast side anyway); the
    * fingerprint-table scan is pruned to the batch's fp_mod partitions
    * AND — for batches within [[MaxPushHashes]] — to the parquet pages
    * its hash set can actually touch. `maxDocsPerHash` drops
    * boilerplate hashes by corpus-side doc count (the
    * [[Winnow.overlap]] cap, applied index-side). */
  def probeBatch(spark: SparkSession, indexDir: String, batch: DataFrame,
                 idCol: String, textCol: String, params: Params = Params(),
                 minShared: Int = 2, maxDocsPerHash: Int = 50): DataFrame = {
    require(minShared >= 1 && maxDocsPerHash >= 1,
      s"probeBatch: bad minShared=$minShared / maxDocsPerHash=$maxDocsPerHash")
    healCompact(spark, indexDir)
    checkOrWriteParams(spark, indexDir, params)
    // typed from the batch's own id column, so empty-index and
    // populated-index probes return the SAME schema for any id type
    val empty = batch.select(col(idCol).as("batch_id"),
        col(idCol).as("corpus_id"), lit(0L).as("n_shared"))
      .limit(0)
    if (!hasData(spark, s"$indexDir/fp")) return empty
    // fingerprint the batch once, to the driver: one job instead of a
    // checkpoint job + a mods-collect job + per-join broadcast collects.
    // The local-relation schema comes from the frame itself, so the id
    // column keeps the CALLER's type (long, int, string, ...)
    val bfpDf = fpRows(batch, idCol, textCol, params)
    val bfpRows: Array[Row] = bfpDf.collect()
    if (bfpRows.isEmpty) return empty
    val bfp = spark.createDataFrame(
      java.util.Arrays.asList(bfpRows: _*), bfpDf.schema)
    val mods = bfpRows.map(_.getInt(2)).distinct.sorted
    val hashes = bfpRows.map(_.getLong(0)).distinct.sorted
    val pruned0 = spark.read.parquet(s"$indexDir/fp")
      .where(col("fp_mod").isin(mods.map(Integer.valueOf).toSeq: _*))
    val pruned =
      if (graft.ops.ScanPrune.shouldPush(spark, s"$indexDir/fp", hashes.length))
        pruned0.where(hashTreePredicate(hashes, col("hash")))
      else pruned0
    // restrict the index to the batch's hashes (exact) — with the tree
    // pushed this is page-bounded IO; without it, one columnar scan
    // filtered through a broadcast hash join. All rows of a surviving
    // hash survive, so the per-hash corpus doc counts computed on the
    // RESTRICTED set are the exact corpus-side counts the boilerplate
    // cap needs.
    val cand = pruned.join(broadcast(bfp.select(col("fp_mod"), col("hash"))
        .distinct()), Seq("fp_mod", "hash"))
      // defensive dedup on the BATCH-BOUNDED candidate slice: an ingest
      // crash between its fp append and its ids append lets the replay
      // re-append the same fp rows, and duplicate (hash, id) rows would
      // inflate both the boilerplate-cap counts and n_shared. One
      // exchange over cand (probe-sized), never the corpus; compact
      // heals the duplicates durably.
      .dropDuplicates("fp_mod", "hash", "id")
      .transform(graft.ops.Pins.pin)
    val okHash = cand.groupBy(col("fp_mod"), col("hash"))
      .agg(count(lit(1)).as("__nd"))
      .where(col("__nd") <= maxDocsPerHash)
      .select(col("fp_mod"), col("hash"))
    cand.join(broadcast(okHash), Seq("fp_mod", "hash"), "left_semi")
      .join(broadcast(bfp.select(col("fp_mod"), col("hash"),
        col("id").as("batch_id"))), Seq("fp_mod", "hash"))
      .where(col("id") =!= col("batch_id"))
      .groupBy(col("batch_id"), col("id").as("corpus_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Ingest: append the batch's fingerprints (ids already in the index
    * and in-batch duplicate ids dropped — replays are absorbed).
    * Returns the number of NEW documents indexed. Rows are clustered
    * one file per modulus bucket per ingest (file-count discipline) and
    * SORTED BY HASH within each file with [[PageRowLimit]]-row pages,
    * so probes can page-prune (see the object doc). */
  def ingestBatch(spark: SparkSession, indexDir: String, batch: DataFrame,
                  idCol: String, textCol: String,
                  params: Params = Params()): Long = {
    // a writer that took graft.ops.Lease.acquire(indexDir) stays fresh
    // through every batch (refresh-only: lease-free callers untouched)
    // and SELF-FENCES: a writer whose lease was reclaimed (>TTL stall)
    // aborts here instead of appending as a zombie mid-maintenance
    graft.ops.Lease.fenceIfLost(spark, indexDir)
    healCompact(spark, indexDir)
    checkOrWriteParams(spark, indexDir, params)
    val fresh0 = batch.dropDuplicates(idCol)
    val fresh =
      if (hasData(spark, s"$indexDir/fp")) {
        ensureIdsManifest(spark, indexDir)
        // batch-bounded replay dedup (the vecIndexIngestBatch
        // discipline): the manifest scan never shuffles — it semi-joins
        // the BROADCAST batch ids (so `present` is at most batch-sized;
        // the manifest holds one row per doc, so no post-semi distinct
        // is needed) and the batch then anti-joins the broadcast
        // `present`. The previous form distinct-ed the fp table's id
        // column: per-GRAM sized, a full corpus shuffle per micro-batch.
        // Above ScanPrune's size gate, TRICKLE batches (<= MaxPushKeys
        // ids) additionally prune the manifest scan to the pages their
        // ids can touch; larger batches keep the plain columnar scan of
        // the one-row-per-doc manifest (prunedScanDf detects over-cap
        // after cap+1 collected rows — it never collects the batch).
        val batchIds = fresh0.select(col(idCol).as("id"))
        val idScan = graft.ops.ScanPrune.prunedScanDf(spark, s"$indexDir/ids",
          spark.read.parquet(s"$indexDir/ids"), "id", batchIds.distinct())
        val present = idScan.join(broadcast(batchIds), Seq("id"), "left_semi")
        fresh0.join(broadcast(present), fresh0(idCol) === present("id"),
          "left_anti")
      } else fresh0
    val rows = fpRows(fresh, idCol, textCol, params).transform(graft.ops.Pins.pin)
    val n = rows.select(col("id")).distinct().count()
    // re-fence at the write boundary: a writer stalled past the TTL in
    // the probe/checkpoint work above aborts HERE, before a zombie
    // append lands under a reclaimed lease
    graft.ops.Lease.fenceIfLost(spark, indexDir)
    if (n > 0) {
      // fp FIRST, manifest second: a crash in between lets the replay
      // re-append fp rows (harmless duplicates — probeBatch dedups its
      // candidate slice, compact rewrites distinct). The reverse order
      // would mark the docs indexed with their fingerprints NEVER
      // written — silent data loss, the unacceptable side.
      writeFp(rows, s"$indexDir/fp")
      writeIds(rows.select(col("id")).distinct(), s"$indexDir/ids")
    }
    n
  }

  /** One-time migration for indexes written before the `ids/` manifest
    * existed: derive it from the fp table (a single distinct — the one
    * corpus-sized pass, paid once per old index, never per ingest). */
  private def ensureIdsManifest(spark: SparkSession, indexDir: String): Unit =
    if (!hasData(spark, s"$indexDir/ids"))
      writeIds(spark.read.parquet(s"$indexDir/fp").select(col("id")).distinct(),
        s"$indexDir/ids")

  /** The one ids/ writer: one sorted file per write (the manifest grows
    * one batch-sized file per ingest; [[compact]] folds them back to
    * one), page rows capped so [[graft.ops.ScanPrune]] point lookups
    * stay page-granular once the manifest outgrows the push gate. */
  private def writeIds(ids: DataFrame, idsDir: String): Unit =
    ids.coalesce(1).sortWithinPartitions(col("id"))
      .write.mode("append")
      .option("parquet.page.row.count.limit", PageRowLimit)
      .parquet(idsDir)

  /** The one fp/ writer: cluster on the partition column (ONE file per
    * modulus bucket per write — without this the table fragments into
    * thousands of small files within a few ingests and file-open
    * overhead, not data, dominates probes), sort by hash within each
    * bucket (satisfying the dynamic-partition writer's required
    * ordering prefix, so no order-destroying extra sort is inserted),
    * and cap page rows so column-index stats stay probe-granular. */
  private def writeFp(rows: DataFrame, fpDir: String): Unit =
    rows.repartition(col("fp_mod"))
      .sortWithinPartitions(col("fp_mod"), col("hash"))
      .write.mode("append").partitionBy("fp_mod")
      .option("parquet.page.row.count.limit", PageRowLimit)
      .parquet(fpDir)

  /** Compact `fp/` back to one hash-sorted file per modulus bucket:
    * rewrite to `fp__tmp`, swap via `fp` -> `fp__old` -> delete. A
    * crash at any point is healed on the next open ([[healCompact]]):
    * the index is never observable without a complete `fp/`. Run it
    * when appends have accumulated enough files that probe task counts
    * (not data) dominate — the same maintenance cadence as any
    * LSM-style store, and like [[graft.ops.Compaction]]'s swap, NOT
    * concurrent-safe against in-flight ingests/probes (a racing open
    * can heal the staged table back mid-swap; compact then restores
    * and throws rather than leaving a headless index). Returns the row
    * count compacted. */
  /** Is maintenance DUE? fs metadata only: committed part-file counts
    * of the fp table and the ids manifest against `maxFiles` — the
    * signal [[compact]] resets (appends add one file per (ingest,
    * modulus), and probe/ingest cost drifts to file-open overhead as
    * they accumulate). The curation pipeline's
    * [[graft.streaming.StreamOps.maintenanceDue]] sibling for
    * standalone winnow indexes. */
  def maintenanceDue(spark: SparkSession, indexDir: String,
                     maxFiles: Int = 64,
                     targetBytes: Long = 0L): DataFrame = {
    require(maxFiles >= 1, s"maintenanceDue: maxFiles >= 1, got $maxFiles")
    require(targetBytes >= 0L,
      s"maintenanceDue: targetBytes >= 0, got $targetBytes")
    import spark.implicits._
    val (f, _) = fs(spark, indexDir)
    Seq("fp", "ids").map { t =>
      val perDir = graft.ops.FsPaths.committedPartDirStats(f,
        new org.apache.hadoop.fs.Path(s"$indexDir/$t"))
      (t, perDir.map(_._1).sum, maxFiles.toLong,
        graft.ops.FsPaths.operativeMeanBytes(perDir), targetBytes,
        graft.ops.FsPaths.fileCountDue(perDir, maxFiles, targetBytes))
    }.toDF("component", "n", "threshold", "mean_bytes", "target_bytes", "due")
  }

  def compact(spark: SparkSession, indexDir: String,
              ttlMs: Long = graft.ops.Lease.DefaultTtlMs): Long =
    // cross-process quiesce: the swap is not concurrent-safe against an
    // in-flight ingest in ANOTHER Spark application — the fold runs
    // HOLDING the durable lease (the only guard that sees one, and it
    // heartbeats every ttl/4 inside so a fold longer than the TTL stays
    // un-reclaimable), so a writer cannot acquire mid-swap either
    graft.ops.Lease.withHeld(spark, indexDir, ttlMs,
        "WinnowIndex compact") {
      healCompact(spark, indexDir)
      if (!hasData(spark, s"$indexDir/fp")) 0L
      else {
        val (f, _) = fs(spark, indexDir)
        // compact owns the staging dirs: clear any crashed rewrite's
        // leftovers (writeFp/writeIds append — stale rows would double-count)
        Seq("fp__tmp", "ids__tmp").foreach { d =>
          val p = new org.apache.hadoop.fs.Path(s"$indexDir/$d")
          if (f.exists(p)) f.delete(p, true): Unit
        }
        // DISTINCT: heals the duplicate (hash, id) rows an ingest crash
        // between its fp append and its ids append can leave behind
        val rows = spark.read.parquet(s"$indexDir/fp")
          .select(col("hash"), col("id"), col("fp_mod")).distinct()
          .transform(graft.ops.Pins.pin) // feeds the fp rewrite AND the manifest rebuild
        val n = rows.count()
        writeFp(rows, s"$indexDir/fp__tmp")
        // the manifest is REBUILT from the compacted fp rows, not copied:
        // compact is the self-heal point where ids/ provably matches fp/
        writeIds(rows.select(col("id")).distinct(), s"$indexDir/ids__tmp")
        installCompacted(f, indexDir, "fp")
        // a crash between the two installs leaves the OLD manifest under
        // the new fp — same id set (compact never changes it), so ingest
        // dedup stays exact; the next compact converges the layout
        installCompacted(f, indexDir, "ids")
        n
      }
    }

  /** Two-rename install of `<name>__tmp` over `<name>`, healed by
    * [[healCompact]] at every crash point. */
  private def installCompacted(f: org.apache.hadoop.fs.FileSystem,
                               indexDir: String, name: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(s"$indexDir/$name")
    val old = new org.apache.hadoop.fs.Path(s"$indexDir/${name}__old")
    val tmp = new org.apache.hadoop.fs.Path(s"$indexDir/${name}__tmp")
    if (f.exists(live))
      require(f.rename(live, old), s"compact: could not stage $live aside")
    // on HDFS, rename(tmp, live) with live ALREADY BACK (a racing open
    // healed <name>__old mid-swap) moves tmp INSIDE live as a child
    // instead of returning false — the conflict the guard below is
    // meant to catch would corrupt the table instead of tripping it.
    // Probe for reappearance first and take the same
    // restore-and-throw path.
    if (f.exists(live) || !f.rename(tmp, live)) {
      // a concurrent open healed live back while we were mid-swap (or
      // the fs refused): restore is already in place, drop our staging
      // and surface the conflict instead of leaving a headless index
      f.delete(tmp, true)
      if (!f.exists(live)) require(f.rename(old, live),
        s"compact: could not restore $old after failed install")
      throw new IllegalStateException(
        s"compact: could not install $tmp — concurrent open or fs error; " +
          "index restored, re-run compact with ingests/probes quiesced")
    }
    f.delete(old, true): Unit
  }
}
