package graft.vec

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The persisted IVF index must reproduce the in-memory IVF search
  * exactly (same seeds, same refinement, same scoring) and must prune
  * unprobed list partitions at scan time. */
class VecIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 120 deterministic vectors in 8 dims, clustered around 4 corners so
  // IVF lists carry real structure
  private lazy val vecs = (0L until 120L).map { i =>
    val corner = (i % 4).toInt
    val v = Array.tabulate(8)(d =>
      (if (d % 4 == corner) 10.0 else 1.0) + (i % 7) * 0.1 + d * 0.01)
    (i, v.toSeq)
  }.toDF("vec_id", "embedding")

  private lazy val queries = vecs.where($"vec_id" % 17 === 0)

  private def shape(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "rank", "neighbor_id", "cos")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("persisted index reproduces the in-memory ivfTopK exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vecidx_").toString
    VecIndex.build(vecs, dir, nlist = 8, kmeansIters = 2)
    val got = shape(VecIndex.topK(queries, dir, k = 5, nprobe = 3))
    val mem = shape(VectorOps.ivfTopK(vecs, queries, "vec_id", "embedding",
      k = 5, nlist = 8, nprobe = 3, kmeansIters = 2))
    assert(got == mem)
    assert(got.nonEmpty)
  }

  test("probe prunes unprobed list partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vecidx_").toString
    VecIndex.build(vecs, dir, nlist = 8, kmeansIters = 1)
    val q = VecIndex.topK(queries.limit(1), dir, k = 3, nprobe = 2)
    q.count()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan.take(1500))
    assert(plan.contains("list_id"), plan.take(1500))
  }

  test("probing every list equals brute force") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vecidx_").toString
    VecIndex.build(vecs, dir, nlist = 4, kmeansIters = 1)
    val got = shape(VecIndex.topK(queries, dir, k = 4, nprobe = 4))
    val brute = shape(VectorOps.bruteForceTopK(vecs, queries,
      "vec_id", "embedding", k = 4))
    assert(got == brute)
  }

  private def shapeD(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "rank", "neighbor_id", "dist")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("persisted IVF-PQ reproduces the in-memory ivfPqTopK exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vecidx_").toString
    VecIndex.buildPq(vecs, dir, nlist = 8, kmeansIters = 2,
      m = 4, ksub = 16, pqIters = 2)
    val got = shapeD(VecIndex.topKPq(queries, dir, k = 5, nprobe = 3))
    val mem = shapeD(VectorOps.ivfPqTopK(vecs, queries, "vec_id", "embedding",
      k = 5, nlist = 8, nprobe = 3, m = 4, ksub = 16,
      kmeansIters = 2, pqIters = 2))
    assert(got == mem)
    assert(got.nonEmpty)
  }

  test("IVF-PQ probe prunes unprobed lists and stores codes, not vectors") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vecidx_").toString
    VecIndex.buildPq(vecs, dir, nlist = 8, kmeansIters = 1, m = 4, ksub = 16)
    val lists = spark.read.parquet(s"$dir/lists")
    assert(lists.columns.sorted.toSeq == Seq("codes", "id", "list_id"))
    val q = VecIndex.topKPq(queries.limit(1), dir, k = 3, nprobe = 2)
    q.count()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan.take(1500))
  }

  test("appendPq encodes with the persisted model into fixed lists") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vecidx_").toString
    // lossless codebooks so an appended exact copy scores ADC dist 0
    VecIndex.buildPq(vecs, dir, nlist = 4, kmeansIters = 1, m = 4,
      ksub = 64, pqIters = 0)
    val v0 = vecs.where($"vec_id" === 0).select("embedding")
      .as[Seq[Double]].head()
    VecIndex.appendPq(Seq((1000L, v0)).toDF("vec_id", "embedding"), dir)
    val hits = shapeD(VecIndex.topKPq(
      vecs.where($"vec_id" === 0), dir, k = 6, nprobe = 4))
    assert(hits.map(_._3).contains(1000L))
    assert(hits.filter(_._3 == 1000L).head._4 == 0.0)
    intercept[IllegalArgumentException] {
      VecIndex.appendPq(Seq((2L, Seq(1.0))).toDF("vec_id", "embedding"), dir)
    }
  }

  test("IVF-PQ refine re-ranks the shortlist by exact L2") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vecidx_").toString
    // lossless setting: every list has few distinct residual sub-vectors,
    // ksub covers them, 0 sweeps keep seeds -> ADC == exact L2, so
    // refined and plain agree and both match exact distances
    VecIndex.buildPq(vecs, dir, nlist = 4, kmeansIters = 1, m = 4,
      ksub = 64, pqIters = 0)
    val plain = shapeD(VecIndex.topKPq(queries, dir, k = 4, nprobe = 4))
    val refined = shapeD(VecIndex.topKPq(queries, dir, k = 4, nprobe = 4,
      refineWith = Some(vecs)))
    assert(refined.map(r => (r._1, r._2, r._3)) ==
      plain.map(r => (r._1, r._2, r._3)))
    // refined distances are exact L2 — cross-check one against the data
    val (qid, _, nid, d) = refined.head
    val getV = (id: Long) => vecs.where($"vec_id" === id)
      .select("embedding").as[Seq[Double]].head()
    val exact = getV(qid).zip(getV(nid)).map { case (a, b) => (a - b) * (a - b) }.sum
    assert(math.abs(d - BigDecimal(exact).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  // The drift scenario rebalance exists for: the index is built BEFORE a
  // new data modality arrives (corner 3 absent), so appends of corner-3
  // rows pile into one frozen list. With two seeds in corner 0, k-means
  // refinement has the degree of freedom to migrate one centroid to the
  // new mass — rebalance should spread the lists back out.
  private lazy val early = vecs.where($"vec_id" % 4 =!= 3)
  private lazy val late = vecs.where($"vec_id" % 4 === 3)

  test("rebalance restores list balance after drifted appends") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vecidx_").toString
    VecIndex.build(early, dir, nlist = 4, kmeansIters = 2)
    VecIndex.append(late, dir)
    val skewed = VecIndex.listStats(spark, dir)
    assert(skewed.nVectors == 120L && skewed.nLists == 4L)
    val (pre, post) = VecIndex.rebalance(spark, dir, kmeansIters = 2)
    assert(pre == skewed)
    assert(post.nVectors == 120L)
    assert(post.cv < skewed.cv,
      s"rebalance should reduce skew: cv ${skewed.cv} -> ${post.cv}")
    assert(post.maxSize < skewed.maxSize)
    // probe equivalence preserved: probing every list is still brute force
    val got = shape(VecIndex.topK(queries, dir, k = 4, nprobe = 4))
    val brute = shape(VectorOps.bruteForceTopK(vecs, queries,
      "vec_id", "embedding", k = 4))
    assert(got == brute)
  }

  test("refreshCentroids: bounded-sample refinement repairs drift, probes stay equivalent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vecidx_").toString
    VecIndex.build(early, dir, nlist = 4, kmeansIters = 2)
    VecIndex.append(late, dir)
    val skewed = VecIndex.listStats(spark, dir)
    // sampleSize 40 over 120 rows -> 1-in-3 hash thinning: the k-means
    // sweeps see a strict sample, never the full table
    val (pre, post) = VecIndex.refreshCentroids(spark, dir,
      sampleSize = 40, kmeansIters = 2)
    assert(pre == skewed)
    assert(post.nVectors == 120L, "refresh must reassign, never drop rows")
    assert(post.cv < skewed.cv,
      s"refresh should reduce drift skew: cv ${skewed.cv} -> ${post.cv}")
    // exhaustive probe is still exactly brute force after the swap
    val got = shape(VecIndex.topK(queries, dir, k = 4, nprobe = 4))
    val brute = shape(VectorOps.bruteForceTopK(vecs, queries,
      "vec_id", "embedding", k = 4))
    assert(got == brute)
    // PQ layouts are refused (their lists hold codes, not vectors)
    val pqDir = java.nio.file.Files.createTempDirectory("graft_vecidx_").toString
    VecIndex.buildPq(vecs, pqDir, nlist = 4, m = 4, ksub = 16)
    val e = intercept[IllegalArgumentException] {
      VecIndex.refreshCentroids(spark, pqDir, sampleSize = 40)
    }
    assert(e.getMessage.contains("IVF-PQ"))
  }

  test("refreshCentroidsPq: bounded-sample refinement repairs drift on the PQ tier; full-coverage refined probe is refresh-invariant") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vecidx_").toString
    VecIndex.buildPq(early, dir, nlist = 4, kmeansIters = 2, m = 4, ksub = 64)
    VecIndex.appendPq(late, dir)
    val skewed = VecIndex.listStats(spark, dir)
    // k * refine covers the whole index, so the exact-L2 re-rank sees
    // EVERY candidate: the refined result is the true L2 top-k and must
    // be identical before and after the refresh (codes and centroids
    // change, the answer must not)
    def fullRefined() = shapeD(VecIndex.topKPq(queries, dir, k = 4,
      nprobe = 4, refineWith = Some(vecs), refine = 30))
    val before = fullRefined()
    val (pre, post) = VecIndex.refreshCentroidsPq(vecs, dir,
      sampleSize = 40, kmeansIters = 2)
    assert(pre == skewed)
    assert(post.nVectors == 120L, "refresh must re-encode, never drop rows")
    assert(post.cv < skewed.cv,
      s"PQ refresh should reduce drift skew: cv ${skewed.cv} -> ${post.cv}")
    assert(fullRefined() == before,
      "exact re-rank over a full shortlist must be refresh-invariant")
    // missing vectors are refused, exactly like rebalancePq
    val e = intercept[IllegalArgumentException] {
      VecIndex.refreshCentroidsPq(vecs.limit(10), dir, sampleSize = 40)
    }
    assert(e.getMessage.contains("covers"))
  }

  test("refreshCentroidsSq8: self-contained repair from dequantized codes; full-probe results are refresh-invariant") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vecidx_").toString
    VecIndex.buildSq8(early, dir, nlist = 4, kmeansIters = 2)
    VecIndex.appendSq8(late, dir)
    val skewed = VecIndex.listStats(spark, dir)
    // probing every list scores every (unchanged) code — the result
    // must be identical across the refresh, whatever the centroids do
    def fullProbe() = shape(VecIndex.topKSq8(queries, dir, k = 4, nprobe = 4))
    val before = fullProbe()
    val (pre, post) = VecIndex.refreshCentroidsSq8(spark, dir,
      sampleSize = 40, kmeansIters = 2)
    assert(pre == skewed)
    assert(post.nVectors == 120L, "refresh must reassign, never drop rows")
    assert(post.cv < skewed.cv,
      s"SQ8 refresh should reduce drift skew: cv ${skewed.cv} -> ${post.cv}")
    assert(fullProbe() == before,
      "codes are untouched; a full probe must be refresh-invariant")
    // layout guards: plain/PQ refresh verbs refuse the SQ8 layout and
    // the SQ8 verb refuses indexes without sq8/ scales
    val e1 = intercept[IllegalArgumentException] {
      VecIndex.refreshCentroids(spark, dir, sampleSize = 40)
    }
    assert(e1.getMessage.contains("IVF-SQ8"))
    val e2 = intercept[IllegalArgumentException] {
      VecIndex.rebalance(spark, dir)
    }
    assert(e2.getMessage.contains("IVF-SQ8"))
    val plainDir = java.nio.file.Files.createTempDirectory("graft_vecidx_").toString
    VecIndex.build(early, plainDir, nlist = 4, kmeansIters = 1)
    val e3 = intercept[IllegalArgumentException] {
      VecIndex.refreshCentroidsSq8(spark, plainDir, sampleSize = 40)
    }
    assert(e3.getMessage.contains("sq8"))
  }

  test("compactLists folds per-append small files; probes, stats and the maintenance policy agree") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vecidx_").toString
    VecIndex.build(vecs.where($"vec_id" < 40L), dir, nlist = 4, kmeansIters = 2)
    // many small appends -> many file sets in the list partitions
    (40L until 120L by 10L).foreach { lo =>
      VecIndex.append(vecs.where($"vec_id" >= lo && $"vec_id" < lo + 10L), dir)
    }
    def due(maxFiles: Int) = VecIndex
      .maintenanceDue(spark, dir, maxFiles = maxFiles)
      .where(org.apache.spark.sql.functions.col("due"))
      .select("component").as[String].collect().toSet
    val before = shape(VecIndex.topK(queries, dir, k = 4, nprobe = 4))
    val statsBefore = VecIndex.listStats(spark, dir)
    val listsP = new org.apache.hadoop.fs.Path(s"$dir/lists")
    val nFiles = graft.ops.FsPaths.committedPartCount(
      listsP.getFileSystem(spark.sparkContext.hadoopConfiguration), listsP)
    assert(nFiles > 8, s"appends should have accumulated files, got $nFiles")
    assert(due(maxFiles = nFiles.toInt) == Set("lists_files"))
    assert(!due(maxFiles = nFiles.toInt + 1).contains("lists_files"))
    val st = VecIndex.compactLists(spark, dir)
    assert(st.filesAfter < st.filesBefore)
    // pure file reorganisation: probes, row counts and occupancy agree
    assert(shape(VecIndex.topK(queries, dir, k = 4, nprobe = 4)) == before)
    assert(VecIndex.listStats(spark, dir) == statsBefore)
    assert(!due(maxFiles = nFiles.toInt).contains("lists_files"))
  }

  test("reassign install is crash-consistent: heal completes or aborts a pending install by epoch") {
    import org.apache.spark.sql.functions.{col, expr}
    def centroidRows(d: String) = spark.read.parquet(s"$d/centroids")
      .select(col("centroid_id"), col("centroid"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSet
    def writeEpoch(d: String, e: String): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(d, "_REASSIGN_EPOCH"),
        e.getBytes("UTF-8")): Unit
    val dir = java.nio.file.Files.createTempDirectory("graft_vecidx_").toString
    VecIndex.build(vecs, dir, nlist = 4, kmeansIters = 2)
    val goodCents = centroidRows(dir)

    // ABORT case: a reassign crashed BEFORE its lists swap — pending
    // exists with an epoch the lists never received. Heal must drop the
    // pending and leave the (consistent) old state untouched.
    spark.read.parquet(s"$dir/centroids")
      .withColumn("centroid", expr("transform(centroid, x -> x + 99.0)"))
      .write.parquet(s"$dir/centroids__pending")
    writeEpoch(s"$dir/centroids__pending", "epoch-abort")
    val statsBefore = VecIndex.listStats(spark, dir) // public entry -> heal
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/centroids__pending")))
    assert(centroidRows(dir) == goodCents, "abort must not touch live centroids")
    assert(statsBefore.nVectors == 120L)

    // COMPLETE case: a reassign crashed AFTER its lists swap (lists
    // carry the pending's epoch) but BEFORE the centroid install — the
    // live centroids are stale. Heal must install the pending centroids
    // (the routing table the swapped lists were assigned against).
    // Simulated with the pending holding the TRUE centroids and the
    // live dir corrupted to stale values.
    spark.read.parquet(s"$dir/centroids").localCheckpoint()
      .write.parquet(s"$dir/centroids__pending")
    writeEpoch(s"$dir/centroids__pending", "epoch-complete")
    writeEpoch(s"$dir/lists", "epoch-complete")
    val stale = spark.read.parquet(s"$dir/centroids").localCheckpoint()
      .withColumn("centroid", expr("transform(centroid, x -> 0.0d)"))
    stale.write.mode("overwrite").parquet(s"$dir/centroids")
    assert(centroidRows(dir) != goodCents) // corruption took
    val got = shape(VecIndex.topK(queries, dir, k = 4, nprobe = 4)) // -> heal
    assert(centroidRows(dir) == goodCents,
      "heal must complete the matched-epoch pending install")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/centroids__pending")))
    val brute = shape(VectorOps.bruteForceTopK(vecs, queries,
      "vec_id", "embedding", k = 4))
    assert(got == brute)

    // SWAP-WINDOW case: a swapDir crashed with live renamed to _bak —
    // heal must restore it before any read touches the missing dir.
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$dir/centroids"),
      java.nio.file.Paths.get(s"$dir/centroids_bak"))
    assert(VecIndex.listStats(spark, dir).nVectors == 120L)
    assert(centroidRows(dir) == goodCents)
  }

  test("listStats heals BEFORE reading counts: the first post-crash call reports healed stats, not stale ones") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def writeEpoch(d: String, e: String): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(d, "_REASSIGN_EPOCH"),
        e.getBytes("UTF-8")): Unit
    val dir = java.nio.file.Files.createTempDirectory("graft_vecidx_").toString
    VecIndex.build(vecs, dir, nlist = 4, kmeansIters = 2)
    // crash in the complete-pending window: the lists swap committed
    // (epochs match) but the centroid/stats install had not run — the
    // persisted stats still describe the PRE-swap lists. Simulated with
    // pending = live centroids and stats overwritten with garbage.
    spark.read.parquet(s"$dir/centroids").localCheckpoint()
      .write.parquet(s"$dir/centroids__pending")
    writeEpoch(s"$dir/centroids__pending", "epoch-stats")
    writeEpoch(s"$dir/lists", "epoch-stats")
    Seq((0L, 999L)).toDF("list_id", "n").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/stats")
    // the FIRST call after the crash must already combine healed counts
    // with healed centroids — reading counts before the heal would hand
    // appendWithPolicy a 999-vector fiction for one policy decision
    val st = VecIndex.listStats(spark, dir)
    assert(st.nVectors == 120L,
      s"first post-crash listStats saw stale counts: $st")
    assert(st.nLists == 4L)
  }

  test("append policy: skewed appends trip it, auto mode repairs, probes stay equivalent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vecidx_").toString
    VecIndex.build(early, dir, nlist = 4, kmeansIters = 2)
    val baseline = VecIndex.listStats(spark, dir)
    // measure the drift scenario's post-append skew on a scratch copy,
    // then set the policy threshold strictly BETWEEN baseline and
    // skewed — the deterministic way to pin "this append trips it"
    val scratch = java.nio.file.Files.createTempDirectory("graft_vecidx_").toString
    VecIndex.build(early, scratch, nlist = 4, kmeansIters = 2)
    VecIndex.append(late, scratch)
    val skewedCv = VecIndex.listStats(spark, scratch).cv
    assert(skewedCv > baseline.cv, "drifted append must increase skew")
    val threshold = (baseline.cv + skewedCv) / 2
    val verdict = VecIndex.appendWithPolicy(late, dir, maxCv = threshold)
    assert(verdict.needsRebalance && !verdict.rebalanced)
    assert(verdict.stats.nVectors == 120L) // append landed regardless
    // same scenario with autoRebalance: the repair runs and the verdict
    // carries the POST-rebalance stats
    val dir2 = java.nio.file.Files.createTempDirectory("graft_vecidx_").toString
    VecIndex.build(early, dir2, nlist = 4, kmeansIters = 2)
    val v2 = VecIndex.appendWithPolicy(late, dir2,
      maxCv = threshold, autoRebalance = true)
    assert(v2.needsRebalance && v2.rebalanced)
    assert(v2.stats.cv < verdict.stats.cv)
    assert(v2.stats.nVectors == 120L)
    // probe equivalence preserved through the policy-triggered rebalance
    val got = shape(VecIndex.topK(queries, dir2, k = 4, nprobe = 4))
    val brute = shape(VectorOps.bruteForceTopK(vecs, queries,
      "vec_id", "embedding", k = 4))
    assert(got == brute)
    // a lax threshold does not trip (no false positives on a quiet append)
    val dir3 = java.nio.file.Files.createTempDirectory("graft_vecidx_").toString
    VecIndex.build(early, dir3, nlist = 4, kmeansIters = 2)
    val v3 = VecIndex.appendWithPolicy(late, dir3, maxCv = 100.0)
    assert(!v3.needsRebalance && !v3.rebalanced)
    // PQ variant recommends but never auto-acts (repair needs the vectors)
    val dir4 = java.nio.file.Files.createTempDirectory("graft_vecidx_").toString
    VecIndex.buildPq(early, dir4, nlist = 4, kmeansIters = 2, m = 4,
      ksub = 64, pqIters = 0)
    val v4 = VecIndex.appendPqWithPolicy(late, dir4, maxCv = threshold)
    assert(v4.needsRebalance && !v4.rebalanced)
  }

  test("listStats is maintained incrementally and self-heals when absent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vecidx_").toString
    VecIndex.build(early, dir, nlist = 4, kmeansIters = 1)
    VecIndex.append(late, dir)
    val incr = VecIndex.listStats(spark, dir)
    assert(incr.nVectors == 120L)
    // wipe the stats table: the next read must heal from parquet footers
    // and agree with the incrementally-maintained numbers
    val fs = new org.apache.hadoop.fs.Path(s"$dir/stats")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/stats"), true)
    assert(VecIndex.listStats(spark, dir) == incr)
  }

  test("rebalancePq re-encodes residuals; refuses partial vector tables") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vecidx_").toString
    VecIndex.buildPq(early, dir, nlist = 4, kmeansIters = 2, m = 4,
      ksub = 64, pqIters = 0)
    VecIndex.appendPq(late, dir)
    val skewed = VecIndex.listStats(spark, dir)
    intercept[IllegalArgumentException] { // missing ids must be refused
      VecIndex.rebalancePq(vecs.where($"vec_id" < 50), dir)
    }
    val (pre, post) = VecIndex.rebalancePq(vecs, dir, kmeansIters = 2)
    assert(pre == skewed && post.nVectors == 120L)
    assert(post.cv < skewed.cv)
    // exact refine over every list is still exact L2 top-k after the swap
    val refined = VecIndex.topKPq(queries, dir, k = 3, nprobe = 4,
      refineWith = Some(vecs))
    val ids = shapeD(refined).map(r => (r._1, r._2, r._3))
    val all = vecs.as[(Long, Seq[Double])].collect()
    val expected = queries.as[(Long, Seq[Double])].collect().toSeq
      .sortBy(_._1).flatMap { case (qid, qv) =>
        all.filter(_._1 != qid)
          .map { case (id, v) =>
            (id, v.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum) }
          .sortBy { case (id, d) => (d, id) }.take(3).zipWithIndex
          .map { case ((id, _), r) => (qid, (r + 1).toLong, id) }
      }
    assert(ids == expected)
    // flat rebalance on a PQ index is a contract violation, not a crash
    intercept[IllegalArgumentException] { VecIndex.rebalance(spark, dir) }
  }

  test("append assigns into fixed lists; dim mismatch throws") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vecidx_").toString
    VecIndex.build(vecs, dir, nlist = 4, kmeansIters = 1)
    // a new vector equal to vector 0's embedding must become its top hit
    val v0 = vecs.where($"vec_id" === 0).select("embedding")
      .as[Seq[Double]].head()
    VecIndex.append(Seq((1000L, v0)).toDF("vec_id", "embedding"), dir)
    // vectors repeat every 28 ids, so vec 0 has exact dups at 28/56/84/112
    // that tie at cos=1.0 and win on id order — the appended copy is the
    // fifth member of that tie group
    val hits = shape(VecIndex.topK(
      vecs.where($"vec_id" === 0), dir, k = 5, nprobe = 1))
    assert(hits.map(_._3).contains(1000L))
    assert(hits.forall(_._4 == 1.0)) // the whole tie group is exact copies
    intercept[IllegalArgumentException] {
      VecIndex.append(Seq((2000L, Seq(1.0, 2.0))).toDF("vec_id", "embedding"), dir)
    }
    intercept[IllegalArgumentException] {
      VecIndex.topK(Seq((1L, Seq(1.0, 2.0))).toDF("vec_id", "embedding"), dir)
    }
  }

  test("SQ8 index: exhaustive probe equals the in-memory asymmetric sq8TopK") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vecidx_sq8_").toString
    VecIndex.buildSq8(vecs, dir, nlist = 4, kmeansIters = 1)
    val got = shape(VecIndex.topKSq8(queries, dir, k = 4, nprobe = 4))
    val model = Quantize.sq8Train(vecs, "embedding", dims = 8)
    val mem = shape(Quantize.sq8TopK(vecs, queries, "vec_id", "embedding",
      k = 4, model))
    assert(got == mem && got.nonEmpty)
  }

  test("SQ8 index stores byte codes, prunes unprobed lists, and approx probe recalls") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vecidx_sq8_").toString
    VecIndex.buildSq8(vecs, dir, nlist = 8, kmeansIters = 2)
    val lists = spark.read.parquet(s"$dir/lists")
    assert(lists.columns.toSet == Set("id", "codes", "list_id"))
    val codes = lists.select($"codes").as[Seq[Int]].head()
    assert(codes.length == 8 && codes.forall(c => c >= 0 && c <= 255))
    val q = VecIndex.topKSq8(queries.limit(1), dir, k = 3, nprobe = 2)
    q.count()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan.take(1500))
    val approx = VecIndex.topKSq8(queries, dir, k = 4, nprobe = 3)
    val exact = VectorOps.bruteForceTopK(vecs, queries, "vec_id", "embedding", k = 4)
    assert(VectorOps.recallAtK(approx, exact) >= 0.75)
  }

  test("appendSq8 encodes with the FROZEN persisted scales, clamping out-of-range") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vecidx_sq8_").toString
    VecIndex.buildSq8(vecs, dir, nlist = 4, kmeansIters = 1)
    val before = spark.read.parquet(s"$dir/sq8").collect().map(_.toSeq).toSet
    // one vector far outside the trained range -> codes clamp, scales unchanged
    val extra = Seq((999L, Seq.fill(8)(1e6))).toDF("vec_id", "embedding")
    VecIndex.appendSq8(extra, dir)
    val after = spark.read.parquet(s"$dir/sq8").collect().map(_.toSeq).toSet
    assert(after == before) // frozen grid
    val row = spark.read.parquet(s"$dir/lists").where($"id" === 999L)
      .select($"codes").as[Seq[Int]].head()
    assert(row.forall(_ == 255)) // clamped to the top of every dim
    // the appended vector is probe-visible
    val probe = VecIndex.topKSq8(queries.limit(1), dir, k = 120, nprobe = 4)
    assert(probe.where($"neighbor_id" === 999L).count() == 1)
  }

  test("cross-process writer lease: repair verbs refused under a live foreign lease, allowed under our own") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vecidx_").toString
    VecIndex.build(vecs, dir, nlist = 4, kmeansIters = 1)
    val lease = java.nio.file.Paths.get(dir, "_lease")
    java.nio.file.Files.write(lease, "99999@other-host".getBytes("UTF-8"))
    val e1 = intercept[IllegalStateException] { VecIndex.compactLists(spark, dir) }
    assert(e1.getMessage.contains("another process"))
    intercept[IllegalStateException] { VecIndex.rebalance(spark, dir) }
    intercept[IllegalStateException] { VecIndex.refreshCentroids(spark, dir) }
    java.nio.file.Files.delete(lease)
    // the holder's own process passes — appendWithPolicy's auto-repair
    // must keep working under the writer's lease
    graft.ops.Lease.acquire(spark, dir)
    VecIndex.compactLists(spark, dir): Unit
    VecIndex.rebalance(spark, dir): Unit
    graft.ops.Lease.release(spark, dir)
  }
}
