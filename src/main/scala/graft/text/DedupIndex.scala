package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted LSH dedup index: the state that makes CONTINUOUS corpus
  * dedup scale. [[StreamOps.dedupIngestBatch]]'s simple form re-reads
  * corpus text and re-computes every corpus MinHash signature on every
  * micro-batch — O(corpus) CPU per batch, the dominant cost long before
  * 100 TB. This index persists what the corpus side contributes to the
  * compare — fingerprints, signatures, band hashes — so a batch probe
  * costs: one columnar scan of the (3-column) band table with the SMALL
  * batch broadcast, signature fetches for candidate ids only, and text
  * fetches from the corpus for candidate ids only. The corpus is never
  * re-signed and never shuffled.
  *
  * Layout under `indexDir` (all parquet, append-only):
  *  - `params/` one row: (shingle_n, num_perm, bands, rows_per_band,
  *    n_mods) — written at first ingest, CHECKED on every reopen: probing
  *    an index with different parameters would silently miss duplicates,
  *    so a mismatch throws instead.
  *  - `fp/` (id, fp): exact-dup probe side.
  *  - `sig/` (id, sig array<long>): estimate-stage support.
  *  - `bands/` partitioned by band_mod = pmod(band_hash, n_mods):
  *    (band_idx, band_hash, id) — candidate probe side. The partitioning
  *    keys the probe join on (band_mod, band_idx, band_hash) so dynamic
  *    partition pruning can skip modulus buckets the batch never hashes
  *    into; per-batch small files in hot buckets fold with the same
  *    compaction discipline as the store ([[graft.store.Store]]).
  *
  * Replay safety is inherited from the dedup semantics themselves
  * (see [[StreamOps.dedupIngestBatch]]): a re-delivered batch
  * exact-matches the fp rows its first delivery appended and drops out
  * before any write. Replays of a batch whose ingest CRASHED mid-write
  * converge too — see [[ingestBatch]]'s write-ordering note (fp last as
  * the commit marker, corpus re-appends skipped by id presence,
  * duplicate sig/bands rows absorbed by the probe's distincts).
  */
object DedupIndex {

  final case class Params(shingleN: Int = 3, numPerm: Int = 64,
                          bands: Int = 16, nMods: Int = 64,
                          threshold: Double = 0.5, maxBucket: Int = 64) {
    require(numPerm % bands == 0, s"bands ($bands) must divide numPerm ($numPerm)")
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    def rowsPerBand: Int = numPerm / bands
  }

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** A table dir is probe-able only if it holds at least one data file:
    * an all-short-docs batch appends ZERO sig/bands rows, and an empty
    * partitioned write leaves just _SUCCESS — reading that throws
    * schema-inference errors on the next batch. */
  private def hasData(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && {
      // hidden-ancestor filter: an in-flight `_temporary/.../part-*`
      // attempt must not make an unreadable dir look probe-able
      val it = fs.listFiles(p, true)
      var found = false
      while (it.hasNext && !found) {
        val st = it.next()
        found = st.getPath.getName.startsWith("part-") &&
          graft.ops.FsPaths.committedUnder(fs, p, st.getPath)
      }
      found
    }
  }

  /** The validated params pin, memoized per dir (the sampleParamsCache
    * discipline): without it EVERY micro-batch ingest/probe paid a
    * driver parquet-read JOB just to re-verify an immutable pin — on
    * the live pipeline path, a per-batch tax that dwarfs the check it
    * funds. Revalidated per check against the params dir's metadata
    * FINGERPRINT ([[graft.ops.FsPaths.dirFingerprint]], one driver
    * listStatus — no parquet read): an index deleted and re-created
    * with different params re-pins instead of validating against the
    * dead index, even when the rebuild happened in ANOTHER process
    * while the dir existed at check time (a bare fs-exists misses
    * that). Single-writer per index by contract (as all maintenance
    * here). */
  private val paramsCache = new java.util.concurrent.ConcurrentHashMap[
    String, ((Int, Int, Int, Int), Seq[(String, Long, Long)])]()

  private def paramsFingerprint(spark: SparkSession,
                                indexDir: String): Seq[(String, Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/params")
    graft.ops.FsPaths.dirFingerprint(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def storedParams(spark: SparkSession,
                           indexDir: String): Option[(Int, Int, Int, Int)] = {
    val fp = paramsFingerprint(spark, indexDir)
    val cached = paramsCache.get(indexDir)
    if (cached != null) {
      if (cached._2 == fp) return Some(cached._1)
      paramsCache.remove(indexDir)
    }
    // a params dir with no COMMITTED file (a first pin that crashed
    // mid-write) is ABSENT, not corrupt — reading it would wedge every
    // later open on a schema-inference error; checkOrWriteParams clears
    // the residue and re-pins
    if (fp.isEmpty || !hasData(spark, s"$indexDir/params")) None
    else {
      val r = spark.read.parquet(s"$indexDir/params").head()
      val s0 = (r.getAs[Int]("shingle_n"), r.getAs[Int]("num_perm"),
        r.getAs[Int]("bands"), r.getAs[Int]("n_mods"))
      paramsCache.put(indexDir, (s0, fp))
      Some(s0)
    }
  }

  /** Verify stored params match; no-op if the index has none yet. The
    * threshold is a per-probe knob (not index state) and is not pinned. */
  private def checkParams(spark: SparkSession, indexDir: String,
                          p: Params): Unit =
    storedParams(spark, indexDir).foreach { stored =>
      require(stored == ((p.shingleN, p.numPerm, p.bands, p.nMods)),
        s"DedupIndex at $indexDir was built with (shingleN, numPerm, bands, nMods) = " +
          s"$stored; probing with ${(p.shingleN, p.numPerm, p.bands, p.nMods)} " +
          "would silently miss duplicates")
    }

  /** Write params on first use; verify they match on reopen. */
  private def checkOrWriteParams(spark: SparkSession, indexDir: String,
                                 p: Params): Unit = {
    import spark.implicits._
    storedParams(spark, indexDir) match {
      case Some(stored) =>
        require(stored == ((p.shingleN, p.numPerm, p.bands, p.nMods)),
          s"DedupIndex at $indexDir was built with (shingleN, numPerm, bands, nMods) = " +
            s"$stored; probing with ${(p.shingleN, p.numPerm, p.bands, p.nMods)} " +
            "would silently miss duplicates")
      case None =>
        // clear a crashed first pin's residue (uncommitted dir) so the
        // rewrite does not die on "path already exists"
        val pdir = new org.apache.hadoop.fs.Path(s"$indexDir/params")
        val fsys = pdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fsys.exists(pdir)) fsys.delete(pdir, true): Unit
        Seq((p.shingleN, p.numPerm, p.bands, p.nMods))
          .toDF("shingle_n", "num_perm", "bands", "n_mods")
          .coalesce(1).write.parquet(s"$indexDir/params")
        paramsCache.put(indexDir,
          ((p.shingleN, p.numPerm, p.bands, p.nMods),
            paramsFingerprint(spark, indexDir)))
    }
  }


  /** The one writer for each index table: sort rows by the probe key
    * within every file and cap parquet pages at
    * [[graft.ops.ScanPrune.PageRowLimit]] rows, so probes can push a
    * point-set predicate and read only the pages their keys touch
    * (the ScanPrune discipline; engages only above the size gate). */
  private def writeSorted(df: DataFrame, dir: String,
                          sortCols: Seq[String],
                          partitionCols: Seq[String] = Nil): Unit = {
    val w = df.sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("append")
      .option("parquet.page.row.count.limit", graft.ops.ScanPrune.PageRowLimit)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(dir)
  }

  /** Batch rows + (__fp, __sig, __bands) service columns — computed once
    * per ingest; the caller's own columns ride along untouched. Docs too
    * short to shingle keep a null __sig/__bands (exact-dedup still
    * applies to them, the near path skips them). */
  private def batchSignatures(batch: DataFrame, textCol: String,
                              p: Params): DataFrame =
    batch
      .withColumn("__fp", TextOps.fingerprintMd5(col(textCol)))
      .withColumn("__sig",
        when(size(TextOps.tokens(col(textCol))) >= p.shingleN,
          graft.functions.TextExpressions.minhash_shingles(
            TextOps.tokens(col(textCol)), p.shingleN, p.numPerm)))
      .withColumn("__bands",
        when(col("__sig").isNotNull,
          TextOps.lshBandHashes(col("__sig"), p.bands, p.rowsPerBand)))
      .transform(graft.ops.Pins.pin)

  /** The probe core shared by [[probeBatch]] (pure, the recurring
    * per-batch cost) and [[ingestBatch]] (probe + append): survivors of
    * `batch` vs the index, WITH the (__fp, __sig, __bands) service
    * columns still attached so the ingest path can append index rows
    * without re-signing. `corpus` supplies candidate TEXTS for the
    * exact-verify stage only — it is reached through candidate-id
    * semi-probes, never scanned for signatures. */
  private def probeWithSigs(batch: DataFrame, corpus: DataFrame,
                            indexDir: String, idCol: String, textCol: String,
                            params: Params,
                            corpusDir: Option[String] = None): DataFrame = {
    val spark = batch.sparkSession
    Seq("__fp", "__sig", "__bands", "__rn").foreach(c =>
      require(!batch.columns.contains(c), s"DedupIndex probe: input already has a $c column"))

    // in-batch exact collapse (keep the smallest id per fingerprint)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(TextOps.fingerprintMd5(col(textCol))).orderBy(col(idCol))
    val collapsed = batch.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
    // the signed batch is consumed FOUR times downstream (band probe,
    // signature join, shingle-set verify, final anti-join); without
    // truncation each consumer re-runs the MinHash signing — the single
    // most expensive per-row step — 4x over. batchSignatures ends with
    // the localCheckpoint that provides exactly that truncation; the
    // second checkpoint this call used to add on top re-materialized
    // the already-pinned frame into a second block set — one wasted
    // job + block write per micro-batch
    val sigs = batchSignatures(collapsed, textCol, params)

    // exact probe: fp anti-join — the index side streams through its
    // scan, the (small) batch is the build side. When the fp table has
    // outgrown the ScanPrune size gate, the scan additionally pushes
    // the batch's fp point set so only the pages those keys can touch
    // are read (exact superset filter: fps outside the batch's set
    // could not anti-match anyway).
    val afterExact =
      if (hasData(spark, s"$indexDir/fp")) {
        val fpDir = s"$indexDir/fp"
        // ScanPrune.prunedScan gates size-first (fs metadata), so the
        // batch-fp collect job only runs on gate-sized tables; null
        // fingerprints are dropped inside (a null can't equi-match)
        val idxFp = graft.ops.ScanPrune.prunedScanDf(spark, fpDir,
          spark.read.parquet(fpDir).select(col("fp")), "fp",
          sigs.select(col("__fp")).distinct())
        sigs.join(idxFp, sigs("__fp") === col("fp"), "left_anti")
      } else sigs

    // near probe, every stage candidate-bounded
    val dupIds: DataFrame =
      if (hasData(spark, s"$indexDir/bands")) {
        // no checkpoint: both consumers (the distinct band-key broadcast
        // and the candidate expansion) recompute this as a narrow
        // explode over the CHECKPOINTED sigs — cheaper than another
        // materialization job + block write per batch
        val probe = afterExact
          .where(col("__bands").isNotNull)
          .select(col(idCol).as("id_r"),
            posexplode(col("__bands")).as(Seq("band_idx", "band_hash")))
          .withColumn("band_mod", pmod(col("band_hash"), lit(params.nMods)))
        val bandKey = Seq("band_mod", "band_idx", "band_hash")
        // Bucket-capped candidate expansion — the same maxBucket
        // discipline as the self-join path's bucketPairs: a band value
        // shared by hundreds of corpus docs is boilerplate, carries no
        // dedup signal, and would turn the probe into an
        // O(batch x bucket) pair blowup (measured 10x wall on a corpus
        // with a uniform J~0.3 background).
        // band-hash point set from the CHECKPOINTED sigs (a SUPERSET of
        // the probe's keys — exactness stays with the join): pushes the
        // page filter when the band table clears the size gate
        val bandsDir = s"$indexDir/bands"
        val bandTable = graft.ops.ScanPrune.prunedScanDf(spark, bandsDir,
          spark.read.parquet(bandsDir), "band_hash",
          sigs.where(col("__bands").isNotNull)
            .select(explode(col("__bands")).as("__bh")).distinct())
        // The cap is a per-band-key DISTINCT-id count (a crash replay
        // can leave duplicate band rows — see [[ingestBatch]]'s write
        // ordering — and a raw count would let them push a boundary
        // bucket past the cap and silently drop its candidates). r15
        // computed it as a separate groupBy over a CHECKPOINTED
        // `matched` plus a broadcast semi-join back — two extra job
        // barriers per micro-batch on the probe's sequential chain. Two
        // streaming window functions over one band-key shuffle compute
        // the same count in the same pass that feeds the expansion
        // (dense_rank numbers each key's distinct ids, max over the key
        // takes the count): no per-key id set ever materializes (the
        // no-mega-bucket discipline — both frames are running counters
        // over the sorted partition), and over-cap keys drop exactly as
        // before.
        val wOrd = org.apache.spark.sql.expressions.Window
          .partitionBy(bandKey.map(col): _*).orderBy(col("id"))
        val wKey = org.apache.spark.sql.expressions.Window
          .partitionBy(bandKey.map(col): _*)
        // id-identical pairs are excluded: under the id-uniqueness
        // contract a batch id can only equal a corpus id when a CRASHED
        // ingest's replay meets its own already-committed bands rows
        // (bands written, fp not — see [[ingestBatch]]'s ordering).
        // Without the filter the replay self-matches at Jaccard 1.0 and
        // drops, so its fp rows are never written — the fp table then
        // permanently misses those docs and a later exact duplicate
        // whose band buckets all exceed maxBucket slips through. With
        // it the replay keeps the row as a survivor, the corpus
        // id-presence check skips the re-append, and the missing index
        // rows are written — the documented convergence.
        val candidates0 = bandTable
          .join(broadcast(probe.select(bandKey.map(col): _*).distinct()), bandKey)
          .withColumn("__dr", dense_rank().over(wOrd))
          .withColumn("__n", max(col("__dr")).over(wKey))
          .where(col("__n") <= params.maxBucket)
          .join(broadcast(probe), bandKey)
          .select(col("id").as("id_l"), col("id_r"))
          .where(col("id_l") =!= col("id_r"))
          .distinct()
        // pin the pair set ONLY when the sig table clears the pushdown
        // gate: the gated point-set collect below is then a SECOND
        // consumer that would otherwise recompute the whole band probe
        // for its keys. Below the gate the chain has exactly one
        // consumer (the pinned `estimated`), and the pin would be one
        // wasted job + block write per micro-batch (the exactNew
        // lesson: pin only what is actually re-consumed).
        val sigDir = s"$indexDir/sig"
        val candidates =
          if (graft.ops.ScanPrune.tableBytes(spark, sigDir) >=
              graft.ops.ScanPrune.PushMinTableBytes)
            candidates0.transform(graft.ops.Pins.pin)
          else candidates0
        // candidate ids are bucket-capped (bounded by batch x maxBucket):
        // push them as a point set when the sig table clears the gate —
        // prunedScan dispatches on the actual id type (long/int/string)
        // instead of assuming bigint ids
        val sigTable = graft.ops.ScanPrune.prunedScanDf(spark, sigDir,
          spark.read.parquet(sigDir), "id",
          candidates.select(col("id_l")).distinct())
        // estimate fused onto the candidate chain and pinned HERE: the
        // est-filtered pair set is the frame with three consumers (the
        // corpus text-fetch point set, the lSets semi-probe, the final
        // verify join) and is SMALLER than the raw candidates the r15
        // shape pinned — one materialization job covers band probe +
        // cap + expansion + estimate where r15 spent three
        // (matched/candidates pins + the estimate re-planned per
        // consumer).
        val estimated = (candidates
          .join(sigTable
            .withColumnRenamed("id", "id_l").withColumnRenamed("sig", "sig_l"), "id_l")
          .join(afterExact.select(col(idCol).as("id_r"), col("__sig").as("sig_r")), "id_r")
          // sig_agreement kernel — codegen'd agreement count instead of
          // the interpreted zip_with/aggregate HOF composition
          .withColumn("est",
            graft.functions.TextExpressions.sig_agreement(
              col("sig_l"), col("sig_r")).cast("double") / params.numPerm)
          .where(col("est") >= params.threshold * 0.5)
          .select(col("id_l"), col("id_r")))
          .transform(graft.ops.Pins.pin)
        // exact verify: fetch TEXT for candidate ids only — a semi-probe
        // into the corpus, not a corpus scan-and-sign. When the caller
        // owns the corpus DIRECTORY (the ingest path, whose writes keep
        // it id-sorted with page caps), the candidate id point set also
        // pushes down, so the fetch reads only the pages those ids can
        // touch instead of every id+text page — the text column is the
        // table's fat column, making this the probe's dominant IO once
        // the corpus outgrows the gate
        val corpusForTexts = corpusDir match {
          case Some(d) => graft.ops.ScanPrune.prunedScanDf(spark, d,
            corpus, idCol, estimated.select(col("id_l")).distinct())
          case None => corpus
        }
        val lSets = corpusForTexts
          .select(col(idCol).as("id_l"), col(textCol).as("ltext"))
          .join(estimated.select(col("id_l")).distinct(), Seq("id_l"), "left_semi")
          .withColumn("sset_l", array_distinct(
            TextOps.wordShingles(TextOps.tokens(col("ltext")), params.shingleN)))
          .drop("ltext")
        val rSets = afterExact
          .select(col(idCol).as("id_r"), array_distinct(
            TextOps.wordShingles(TextOps.tokens(col(textCol)), params.shingleN)).as("sset_r"))
        estimated.join(lSets, "id_l").join(rSets, "id_r")
          .withColumn("inter", size(array_intersect(col("sset_l"), col("sset_r"))))
          // |A ∪ B| = |A| + |B| - |A ∩ B| (both sides array_distinct'ed):
          // one hash-set pass per pair instead of two
          .withColumn("uni",
            size(col("sset_l")) + size(col("sset_r")) - col("inter"))
          .where(col("uni") > 0 &&
            col("inter").cast("double") / col("uni") >= params.threshold)
          .select(col("id_r")).distinct()
      } else afterExact.limit(0).select(col(idCol).as("id_r"))

    afterExact.join(dupIds, col(idCol) === col("id_r"), "left_anti")
  }

  /** Pure index probe — the recurring per-batch cost of continuous
    * dedup once the corpus side has been signed ONCE (at ingest, or by
    * [[buildFrom]]): survivors of `batch` vs the index, nothing
    * written. Per-batch work is bounded by the batch and its candidate
    * matches — one pruned scan of the 3-column band table against the
    * broadcast batch, signature fetches for candidate ids, text fetches
    * for candidate ids — so the cost stays FLAT as the corpus grows,
    * where [[TextOps.dedupIncremental]]'s scan form re-signs the whole
    * corpus every batch (O(corpus) CPU per batch). `corpus` supplies
    * candidate texts for the exact-verify stage only. Pass `corpusDir`
    * when the corpus directory's writes keep it id-sorted with
    * page-capped rows ([[ingestBatch]]'s layout): the candidate-text
    * fetch then pushes the candidate id point set and reads only the
    * pages those ids can touch — above the size gate the text column is
    * otherwise the probe's dominant IO. */
  def probeBatch(batch: DataFrame, corpus: DataFrame, indexDir: String,
                 idCol: String = "doc_id", textCol: String = "text",
                 params: Params = Params(),
                 corpusDir: Option[String] = None): DataFrame = {
    checkParams(batch.sparkSession, indexDir, params)
    probeWithSigs(batch, corpus, indexDir, idCol, textCol, params, corpusDir)
      .drop("__fp", "__sig", "__bands")
  }

  /** Backfill: sign EVERY row of an existing corpus into the index in
    * one pass — the one-time conversion from scan-everything
    * incremental dedup to flat per-batch probes. No dedup is applied:
    * the corpus is indexed as-is, exactly the set the scan form
    * compares against. Returns the number of rows indexed. */
  def buildFrom(corpus: DataFrame, indexDir: String,
                idCol: String = "doc_id", textCol: String = "text",
                params: Params = Params()): Long = {
    val spark = corpus.sparkSession
    checkOrWriteParams(spark, indexDir, params)
    val sigs = batchSignatures(
      corpus.select(col(idCol), col(textCol)), textCol, params)
    writeSorted(sigs.select(col(idCol).as("id"), col("__fp").as("fp")),
      s"$indexDir/fp", Seq("fp"))
    writeSorted(sigs.where(col("__sig").isNotNull)
        .select(col(idCol).as("id"), col("__sig").as("sig")),
      s"$indexDir/sig", Seq("id"))
    writeSorted(sigs.where(col("__bands").isNotNull)
        .select(col(idCol).as("id"),
          posexplode(col("__bands")).as(Seq("band_idx", "band_hash")))
        .withColumn("band_mod", pmod(col("band_hash"), lit(params.nMods))),
      s"$indexDir/bands", Seq("band_mod", "band_hash"), Seq("band_mod"))
    sigs.count()
  }

  /** Ingest one batch through the index: drop exact dups (fp probe) and
    * near dups (band probe -> signature estimate -> exact-Jaccard verify
    * against candidate corpus texts only), append survivors to
    * `corpusDir` and their index rows to `indexDir`. Returns the number
    * of rows appended to the CORPUS.
    *
    * `batch` must carry at least (idCol, textCol); survivor rows are
    * appended to the corpus with ALL their columns.
    *
    * CRASH ordering (the WinnowIndex fp-then-ids discipline): the fp
    * table is written LAST — it is the replay decision key (the exact
    * probe drops on it), so it must be the ingest's commit marker. The
    * possible interrupted states then all converge on replay:
    *  - corpus appended, index not: the replay's survivors id-match the
    *    corpus (the check below — ids ride two broadcast joins against
    *    a column-pruned corpus id scan, the vecIndexIngestBatch shape),
    *    so the corpus is NOT re-appended while the index rows are
    *    written for the first time. Without this check the replay
    *    re-appended the whole batch — duplicate corpus rows forever.
    *  - sig and/or bands appended, fp not: the replay re-appends them —
    *    duplicate sig/bands rows are absorbed by the probe's distincts
    *    (and the bucket cap counts DISTINCT ids), so probe results are
    *    unchanged; the bloat is one crashed batch's rows until the next
    *    [[compact]] rewrite. The replay's rows SURVIVE the probe to get
    *    there: its banded rows meet their own committed bands rows, and
    *    the candidate stage excludes id-identical pairs (only a crashed
    *    replay can produce them under the id-uniqueness contract) —
    *    without that exclusion the replay self-matched at Jaccard 1.0,
    *    dropped, and the fp rows were never written.
    *  - everything appended: the replay drops at the fp probe — 0 rows.
    * Ids are unique by engine contract; a caller re-using an id for new
    * content forfeits that row's corpus append (documented, refused
    * nowhere — the id is the identity). */
  def ingestBatch(batch: DataFrame, corpusDir: String, indexDir: String,
                  idCol: String = "doc_id", textCol: String = "text",
                  params: Params = Params()): Long = {
    val spark = batch.sparkSession
    // a writer that took graft.ops.Lease.acquire(indexDir) stays fresh
    // through every batch (refresh-only: lease-free callers untouched)
    // and SELF-FENCES: a writer whose lease was reclaimed (>TTL stall)
    // aborts here instead of appending as a zombie mid-maintenance
    graft.ops.Lease.fenceIfLost(spark, indexDir)
    checkOrWriteParams(spark, indexDir, params)
    // SNAPSHOT the corpus read set (committed part files at entry):
    // this call both READS corpusDir (candidate texts; the id-presence
    // probe inside the corpus-append action itself) and APPENDS to it.
    // Reading the directory lazily leaves each consumer's planner to
    // re-list it — locally safe (listing precedes the job's commit),
    // but an object-store listing inconsistency or a re-listing retry
    // after partial commit could pull this call's own append into its
    // read and double-count. Explicit paths pin the read set once.
    val corpusSnapshot = graft.ops.FsPaths.committedPartPaths(
      new org.apache.hadoop.fs.Path(corpusDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(corpusDir))
    val hadCorpus = corpusSnapshot.nonEmpty
    val corpus =
      if (hadCorpus) spark.read.parquet(corpusSnapshot: _*)
      else batch.limit(0)
    val survivors =
      probeWithSigs(batch, corpus, indexDir, idCol, textCol, params,
          corpusDir = Some(corpusDir))
        .transform(graft.ops.Pins.pin) // materialize BEFORE the appends, so the probes
                           // cannot see the rows this call is itself writing
    val n = survivors.count()
    if (n == 0) return 0L
    val fresh =
      if (hadCorpus) {
        // the corpus is written id-sorted with page-capped rows (below),
        // so once it clears the ScanPrune gates this per-batch presence
        // scan reads only the pages the survivors' ids can touch —
        // without the pushdown the id-column scan would grow linearly
        // with the corpus, the exact drift the fp probe's sorted layout
        // already prevents on the index side. FULL-ROW table, so the
        // gate weighs the ID COLUMN's bytes (cached footer walk), not
        // the total — the fpDedupIngestBatch discipline
        val sp = graft.ops.ScanPrune
        val idScan = corpus.select(col(idCol))
        val total = sp.tableBytes(spark, corpusDir)
        val ids =
          if (total >= sp.PushMinTableBytes &&
              sp.columnGate(spark, corpusDir, idCol, total))
            sp.prunedScanDf(spark, corpusDir, idScan, idCol,
              survivors.select(col(idCol)), minTableBytes = 0L)
          else idScan
        val present = ids.join(broadcast(survivors.select(col(idCol))),
          Seq(idCol), "left_semi")
        // deliberately NOT pinned: fresh has two consumers (the count and
        // the corpus write), but its subtree above the checkpointed
        // survivors is one pruned id scan + two broadcast joins — both
        // evaluations read the PRE-append corpus (count runs before the
        // write, the write's own evaluation precedes its append), so
        // laziness is safe, and the eager checkpoint barrier measured
        // more expensive than the recompute (the dedupIncremental
        // exactNew lesson)
        survivors.join(broadcast(present), Seq(idCol), "left_anti")
      } else survivors
    // re-fence at the write boundary: the probe's shuffles/checkpoints
    // sit between the batch-entry fence and the appends — a writer
    // stalled past the TTL in that window aborts HERE, before a zombie
    // append lands under a reclaimed lease
    graft.ops.Lease.fenceIfLost(spark, indexDir)
    // the appended count rides the corpus write itself via observe():
    // a separate fresh.count() evaluated the presence anti-join twice
    // per batch (once to count, once to write) and was one more
    // sequential job barrier on the chain. When the corpus is fresh,
    // fresh == survivors and the count is already in hand (n > 0), so
    // the write keeps its non-empty guard.
    val freshObs = new org.apache.spark.sql.Observation()
    def writeCorpus(): Long = {
      // corpus keeps the caller's full row shape, id-sorted within each
      // file for the presence pushdown above
      fresh.observe(freshObs, count(lit(1)).as("n"))
        .select(batch.columns.map(col): _*)
        .sortWithinPartitions(col(idCol))
        .write.mode("append")
        .option("parquet.page.row.count.limit", graft.ops.ScanPrune.PageRowLimit)
        .parquet(corpusDir)
      freshObs.get("n").asInstanceOf[Number].longValue()
    }
    // corpus, sig and bands have no ordering contract BETWEEN them (all
    // three must only precede fp, the commit marker — every partial
    // crash state converges on replay, see the ordering note above; the
    // presence check reads the SNAPSHOT listing, so the overlapped
    // corpus append cannot leak into its own read): overlap the three
    // writes so the per-batch append pays one job latency, not three.
    // fp stays strictly last.
    @volatile var appended = 0L
    graft.ops.Par.inParallel(
      () => appended = if (hadCorpus) writeCorpus() else { writeCorpus(): Unit; n },
      () => writeSorted(survivors.where(col("__sig").isNotNull)
          .select(col(idCol).as("id"), col("__sig").as("sig")),
        s"$indexDir/sig", Seq("id")),
      () => writeSorted(survivors.where(col("__bands").isNotNull)
          .select(col(idCol).as("id"),
            posexplode(col("__bands")).as(Seq("band_idx", "band_hash")))
          .withColumn("band_mod", pmod(col("band_hash"), lit(params.nMods))),
        s"$indexDir/bands", Seq("band_mod", "band_hash"), Seq("band_mod")))
    // fp LAST: the commit marker (see the ordering note above)
    writeSorted(survivors.select(col(idCol).as("id"), col("__fp").as("fp")),
      s"$indexDir/fp", Seq("fp"))
    appended
  }

  /** Fold the per-batch small files each ingest appends — every table
    * gains up to shuffle-partitions files per batch (the band table in
    * up to n_mods hot buckets), and a long-running ingest stream turns
    * that into the classic small-files scan tax. Delegates to
    * [[graft.ops.Compaction.compact]]: same atomic tmp-write + swap, the
    * band table keeps its band_mod partitioning. Run between ingests
    * (the swap is not concurrent-safe against an in-flight probe). */
  /** Is maintenance DUE? fs metadata only: committed part-file counts
    * of the three index tables against `maxFiles`, and — when a
    * `targetBytes` compaction target is supplied — mean committed file
    * size against it ([[graft.ops.FsPaths.fileCountDue]]: 64 files of
    * 1 MB and 64 files of 1 GB are different problems, so a deployment
    * derives its threshold from the byte target, not the count). The
    * signals [[compact]] resets. The curation pipeline's
    * [[StreamOps.maintenanceDue]] sibling for standalone dedup
    * indexes. */
  def maintenanceDue(spark: SparkSession, indexDir: String,
                     maxFiles: Int = 64,
                     targetBytes: Long = 0L): DataFrame = {
    require(maxFiles >= 1, s"maintenanceDue: maxFiles >= 1, got $maxFiles")
    require(targetBytes >= 0L,
      s"maintenanceDue: targetBytes >= 0, got $targetBytes")
    import spark.implicits._
    Seq("fp", "sig", "bands").map { t =>
      val p = new org.apache.hadoop.fs.Path(s"$indexDir/$t")
      val perDir = graft.ops.FsPaths.committedPartDirStats(
        p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
      (t, perDir.map(_._1).sum, maxFiles.toLong,
        graft.ops.FsPaths.operativeMeanBytes(perDir), targetBytes,
        graft.ops.FsPaths.fileCountDue(perDir, maxFiles, targetBytes))
    }.toDF("component", "n", "threshold", "mean_bytes", "target_bytes", "due")
  }

  def compact(spark: SparkSession, indexDir: String,
              targetBytes: Long = 0L,
              ttlMs: Long = graft.ops.Lease.DefaultTtlMs)
      : Map[String, graft.ops.Compaction.CompactionStats] =
    // cross-process quiesce: the swap is not concurrent-safe against an
    // in-flight ingest, and "run between ingests" is unenforceable
    // against ANOTHER Spark application without the durable lease —
    // HELD for the whole fold (heartbeated every ttl/4 inside, so a
    // fold longer than the TTL stays un-reclaimable), so a writer
    // cannot acquire mid-swap. ttlMs is the deployment's crash-detection
    // knob (see the Lease TTL invariant).
    // targetBytes = 0 means the 128 MB default (callers forwarding an
    // optional byte policy pass their knob through unchanged).
    graft.ops.Lease.withHeld(spark, indexDir, ttlMs, "DedupIndex compact") {
    val tb = if (targetBytes > 0L) targetBytes else 128L << 20
    // each table keeps its probe-key sort through the rewrite, so
    // ScanPrune page pruning survives compaction. sig/bands rewrite
    // DISTINCT: a crashed ingest's replay can re-append them (see
    // [[ingestBatch]]'s ordering note) — duplicates are absorbed at
    // probe time, and the compact rewrite heals them DURABLY (the
    // WinnowIndex fp-distinct discipline). fp cannot duplicate (it is
    // the commit marker: written once, or the replay drops the batch),
    // so it skips the distinct's shuffle.
    val tables = Seq(
      ("fp", Seq("fp"), Nil, false),
      ("sig", Seq("id"), Nil, true),
      ("bands", Seq("band_hash"), Seq("band_mod"), true))
    tables.flatMap { case (t, sortCols, parts, dedup) =>
      val dir = s"$indexDir/$t"
      if (hasData(spark, dir))
        Some(t -> graft.ops.Compaction.compact(spark, dir, tb,
          sortBy = sortCols, partitionBy = parts, distinctRows = dedup))
      else None
    }.toMap
    }

  /** Streaming form: [[StreamOps.dedupIngestStream]] with the index
    * doing the per-batch work instead of a corpus re-scan. */
  def ingestStream(docs: DataFrame, corpusDir: String, indexDir: String,
                   idCol: String = "doc_id", textCol: String = "text",
                   params: Params = Params())
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          ingestBatch(batch, corpusDir, indexDir, idCol, textCol, params): Unit
      }
}
