package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The persisted LSH dedup index must reproduce the scan-everything
  * incremental dedup exactly — it is a materialization of the same
  * compare, not a different algorithm. */
class DedupIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def dirs(): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory("graft_didx_")
    (root.resolve("corpus").toString, root.resolve("index").toString)
  }

  private val tA = "alpha beta gamma delta epsilon zeta"
  private val tB = "completely different text with no shared shingles at all"
  private val tNear = "alpha beta gamma delta epsilon eta" // trigram J = 0.6 vs tA
  private val tC = "yet another fully unrelated document body for the third batch"

  test("index ingest: exact, near and in-batch dups dropped across batches; replay no-op") {
    val (corpus, index) = dirs()
    val b1 = Seq((1L, tA, "s1"), (2L, tB, "s1"), (6L, tB, "s1"))
      .toDF("doc_id", "text", "source")
    assert(DedupIndex.ingestBatch(b1, corpus, index) == 2L) // 6 is an in-batch dup
    val b2 = Seq((3L, tA, "s2"), (4L, tNear, "s2"), (5L, tC, "s2"))
      .toDF("doc_id", "text", "source")
    assert(DedupIndex.ingestBatch(b2, corpus, index) == 1L) // only 5 is novel
    val got = spark.read.parquet(corpus)
    assert(got.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 5L))
    assert(got.columns.toSet == Set("doc_id", "text", "source")) // full row shape
    // crash-replay of batch 2: all rows exact-match the fp index now
    assert(DedupIndex.ingestBatch(b2, corpus, index) == 0L)
    assert(spark.read.parquet(corpus).count() == 3)
    // the index grew only by the survivors
    assert(spark.read.parquet(s"$index/fp").count() == 3)
    assert(spark.read.parquet(s"$index/sig").count() == 3)
  }

  test("ingest corpus read set is a SNAPSHOT: files landing after the listing never join the read") {
    // ingestBatch both reads corpusDir (candidate texts; the id-presence
    // probe inside the corpus-append action) and appends to it — the
    // read must be pinned to the entry-time committed file set, or a
    // re-listing (planner re-plan, object-store inconsistency, stage
    // retry after partial commit) could pull the call's own append into
    // its read and double-count. This asserts the exact wiring the
    // ingest uses: an explicit committedPartPaths read is invariant
    // under later appends, where a directory read picks them up.
    val (corpus, index) = dirs()
    val b1 = Seq((1L, tA, "s1"), (2L, tB, "s1")).toDF("doc_id", "text", "source")
    assert(DedupIndex.ingestBatch(b1, corpus, index) == 2L)
    val fs = new org.apache.hadoop.fs.Path(corpus)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snap = graft.ops.FsPaths.committedPartPaths(
      fs, new org.apache.hadoop.fs.Path(corpus))
    assert(snap.nonEmpty)
    val pinnedRead = spark.read.parquet(snap: _*)
    val before = pinnedRead.select("doc_id").as[Long].collect().toSet
    // a concurrent append lands AFTER the listing
    Seq((99L, tC, "s9")).toDF("doc_id", "text", "source")
      .write.mode("append").parquet(corpus)
    // re-evaluating the pinned frame still reads the snapshot; a fresh
    // directory read sees the new row
    assert(pinnedRead.select("doc_id").as[Long].collect().toSet == before)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSet == before + 99L)
  }

  test("index probe agrees with the scan-everything dedupIncremental") {
    val (corpus, index) = dirs()
    val existing = (0L until 40L).map(i => (i, s"document number $i body token$i filler words here"))
      .toDF("doc_id", "text")
    DedupIndex.ingestBatch(existing, corpus, index)
    // batch: an exact dup, two near-dups, and novels
    val batch = Seq(
      (100L, "document number 7 body token7 filler words here"),      // exact of 7
      (101L, "document number 9 body token9 filler words extra"),     // near of 9
      (102L, "entirely new content that matches nothing at all one"),
      (103L, "document number 13 body token13 filler words there"),   // near of 13
      (104L, "another brand new unique document with fresh material"))
      .toDF("doc_id", "text")
    val viaIndex = {
      val before = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      DedupIndex.ingestBatch(batch, corpus, index)
      spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet -- before
    }
    val naive = TextOps.dedupIncremental(
        batch, existing, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(viaIndex == naive)
    assert(viaIndex == Set(102L, 104L))
  }

  test("buildFrom + pure probeBatch agrees with scan-everything dedupIncremental") {
    val (_, index) = dirs()
    val existing = (0L until 40L).map(i => (i, s"document number $i body token$i filler words here"))
      .toDF("doc_id", "text")
    assert(DedupIndex.buildFrom(existing, index) == 40L)
    val batch = Seq(
      (100L, "document number 7 body token7 filler words here"),      // exact of 7
      (101L, "document number 9 body token9 filler words extra"),     // near of 9
      (102L, "entirely new content that matches nothing at all one"),
      (103L, "document number 13 body token13 filler words there"),   // near of 13
      (104L, "another brand new unique document with fresh material"))
      .toDF("doc_id", "text")
    // the TextOps indexed overload is the public face of the probe
    val viaProbe = TextOps.dedupIncremental(batch, existing, "doc_id", "text",
        index, DedupIndex.Params())
      .select("doc_id").as[Long].collect().toSet
    val naive = TextOps.dedupIncremental(batch, existing, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(viaProbe == naive)
    assert(viaProbe == Set(102L, 104L))
    // probe output keeps the caller's row shape, no service columns
    assert(DedupIndex.probeBatch(batch, existing, index)
      .columns.toSeq == Seq("doc_id", "text"))
    // PURE: the probe wrote nothing — fp/sig row counts unchanged
    assert(spark.read.parquet(s"$index/fp").count() == 40)
    assert(spark.read.parquet(s"$index/sig").count() == 40)
    // and a probe with drifted params still throws
    val e = intercept[IllegalArgumentException] {
      DedupIndex.probeBatch(batch, existing, index,
        params = DedupIndex.Params(numPerm = 128))
    }
    assert(e.getMessage.contains("silently miss"))
  }

  test("short docs exact-dedup even though they cannot shingle") {
    val (corpus, index) = dirs()
    val b1 = Seq((1L, "hi"), (2L, "yo")).toDF("doc_id", "text")
    assert(DedupIndex.ingestBatch(b1, corpus, index) == 2L)
    val b2 = Seq((3L, "hi"), (4L, "new")).toDF("doc_id", "text")
    assert(DedupIndex.ingestBatch(b2, corpus, index) == 1L) // "hi" exact-dropped
    // short docs contribute fp rows but no sig/bands rows
    assert(spark.read.parquet(s"$index/fp").count() == 3)
    assert(spark.read.parquet(s"$index/sig").count() == 0)
  }

  test("parameter mismatch on reopen throws instead of silently missing dups") {
    val (corpus, index) = dirs()
    DedupIndex.ingestBatch(Seq((1L, tA)).toDF("doc_id", "text"), corpus, index)
    val e = intercept[IllegalArgumentException] {
      DedupIndex.ingestBatch(Seq((2L, tB)).toDF("doc_id", "text"), corpus, index,
        params = DedupIndex.Params(numPerm = 128))
    }
    assert(e.getMessage.contains("silently miss"))
    // threshold is a probe knob, not index state — no throw
    DedupIndex.ingestBatch(Seq((2L, tB)).toDF("doc_id", "text"), corpus, index,
      params = DedupIndex.Params(threshold = 0.7))
    // a DELETED-and-recreated index re-pins against the new dir — the
    // memoized pin must not validate against the dead index
    val hp = new org.apache.hadoop.fs.Path(index)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    DedupIndex.ingestBatch(Seq((3L, tC)).toDF("doc_id", "text"), corpus, index,
      params = DedupIndex.Params(numPerm = 128, bands = 16))
    // and the NEW pin enforces from the cache path
    val e2 = intercept[IllegalArgumentException] {
      DedupIndex.probeBatch(Seq((4L, tA)).toDF("doc_id", "text"),
        spark.read.parquet(corpus), index)
    }
    assert(e2.getMessage.contains("silently miss"))
  }

  test("compaction folds per-batch files; the index still probes correctly after") {
    val (corpus, index) = dirs()
    DedupIndex.ingestBatch(Seq((1L, tA), (2L, tB)).toDF("doc_id", "text"), corpus, index)
    DedupIndex.ingestBatch(Seq((5L, tC)).toDF("doc_id", "text"), corpus, index)
    def nFiles(dir: String): Int = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true); var n = 0
      while (it.hasNext) {
        val f = it.next().getPath.getName
        if (!f.startsWith("_") && !f.startsWith(".")) n += 1
      }
      n
    }
    val before = nFiles(s"$index/fp")
    // the maintenance policy keys on exactly the count compact resets
    def due(maxFiles: Int) = DedupIndex
      .maintenanceDue(spark, index, maxFiles = maxFiles)
      .where($"due").select("component").as[String].collect().toSet
    assert(due(maxFiles = before).contains("fp"))
    assert(!due(maxFiles = before + 10).contains("fp"))
    val stats = DedupIndex.compact(spark, index)
    assert(stats.keySet == Set("fp", "sig", "bands"))
    assert(!due(maxFiles = before).contains("fp"), "compact re-arms the policy")
    assert(nFiles(s"$index/fp") < before)
    assert(stats("bands").filesAfter <= stats("bands").filesBefore)
    // post-compaction probe: exact + near dups still caught
    assert(DedupIndex.ingestBatch(
      Seq((7L, tA), (8L, tNear)).toDF("doc_id", "text"), corpus, index) == 0L)
  }

  test("streaming form accumulates through the index") {
    val (corpus, index) = dirs()
    val in = java.nio.file.Files.createTempDirectory("graft_didx_in_")
    Seq((1L, tA), (2L, tB)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$in/f1")
    Seq((3L, tA), (4L, tNear), (5L, tC)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$in/f2")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id LONG, text STRING")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$in/f*")
    val q = DedupIndex.ingestStream(stream, corpus, index).start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
      == Set(1L, 2L, 5L))
  }

  test("crash window A (corpus appended, index not): the replay heals — no duplicate corpus rows, index rows land") {
    val (corpus, index) = dirs()
    val b1 = Seq((1L, tA, "s1"), (2L, tB, "s1")).toDF("doc_id", "text", "source")
    assert(DedupIndex.ingestBatch(b1, corpus, index) == 2L)
    // simulate the crash: batch 2's rows reached the corpus but the
    // ingest died before ANY index write
    val b2 = Seq((3L, tC, "s2")).toDF("doc_id", "text", "source")
    b2.write.mode("append").parquet(corpus)
    assert(spark.read.parquet(s"$index/fp").count() == 2) // index unaware
    // the foreachBatch replay re-delivers b2: the fp probe keeps it
    // (not indexed), the id-presence check skips the corpus re-append,
    // the index writes land — both sides converge
    assert(DedupIndex.ingestBatch(b2, corpus, index) == 0L,
      "replay must not re-append corpus rows")
    assert(spark.read.parquet(corpus).count() == 3L, "no duplicates")
    assert(spark.read.parquet(s"$index/fp").count() == 3, "index healed")
    // a SECOND replay now drops at the fp probe (the committed state)
    assert(DedupIndex.ingestBatch(b2, corpus, index) == 0L)
    assert(spark.read.parquet(corpus).count() == 3L)
    assert(spark.read.parquet(s"$index/fp").count() == 3)
    // and the healed index actually dedups: a near-dup of the healed
    // doc is dropped
    val near = Seq((9L, tC + " tail", "s3")).toDF("doc_id", "text", "source")
    assert(DedupIndex.ingestBatch(near, corpus, index) == 0L)
  }

  test("crash window B (sig/bands appended, fp not): duplicate index rows are absorbed — probe results unchanged") {
    val (corpus, index) = dirs()
    val docs = (0L until 30L)
      .map(i => (i, s"document number $i body token$i filler words here"))
      .toDF("doc_id", "text")
    assert(DedupIndex.ingestBatch(docs, corpus, index) == 30L)
    val probe = Seq(
      (100L, "document number 7 body token7 filler words here"),   // exact
      (101L, "document number 8 body token8 filler words tail"),   // near
      (102L, "entirely novel content nothing shared with anything")) // novel
      .toDF("doc_id", "text")
    val baseline = DedupIndex.probeBatch(probe, spark.read.parquet(corpus),
      index).select("doc_id").as[Long].collect().toSet
    // simulate the replay's duplicate appends: every sig and band row
    // written twice (the state a crash between bands and fp leaves
    // after its replay re-appends them)
    val sig = spark.read.parquet(s"$index/sig").localCheckpoint()
    sig.write.mode("append").parquet(s"$index/sig")
    val bands = spark.read.parquet(s"$index/bands").localCheckpoint()
    bands.write.mode("append")
      .partitionBy("band_mod").parquet(s"$index/bands")
    val got = DedupIndex.probeBatch(probe, spark.read.parquet(corpus),
      index).select("doc_id").as[Long].collect().toSet
    assert(got == baseline,
      "duplicate sig/bands rows must not change probe survivors")
    // compact heals the duplicates DURABLY (distinct rewrite), and the
    // probe is still unchanged after
    val nSig = sig.count(); val nBands = bands.count()
    DedupIndex.compact(spark, index)
    assert(spark.read.parquet(s"$index/sig").count() == nSig,
      "compact must fold duplicate sig rows back to the distinct set")
    assert(spark.read.parquet(s"$index/bands").count() == nBands,
      "compact must fold duplicate bands rows back to the distinct set")
    val afterCompact = DedupIndex.probeBatch(probe,
      spark.read.parquet(corpus), index)
      .select("doc_id").as[Long].collect().toSet
    assert(afterCompact == baseline)
  }

  test("crash window C (corpus+sig+bands committed, fp not): the replay does not self-match — the missing fp rows land") {
    val (corpus, index) = dirs()
    val b1 = Seq((1L, tA, "s1"), (2L, tB, "s1")).toDF("doc_id", "text", "source")
    assert(DedupIndex.ingestBatch(b1, corpus, index) == 2L)
    val b2 = Seq((3L, tC, "s2")).toDF("doc_id", "text", "source")
    assert(DedupIndex.ingestBatch(b2, corpus, index) == 1L)
    // simulate a crash between the bands write and the fp write (fp is
    // written LAST — the commit marker): strip batch 2's fp rows
    val fpDir = s"$index/fp"
    val keep = spark.read.parquet(fpDir).where($"id" < 3L).localCheckpoint()
    val hp = new org.apache.hadoop.fs.Path(fpDir)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    keep.write.parquet(fpDir)
    assert(spark.read.parquet(fpDir).count() == 2)
    // the replay's banded rows meet their own committed bands rows
    // (id_l == id_r, estimate 1.0): without the id-identical-pair
    // exclusion they dropped as duplicates and doc 3's fp row was never
    // written — the fp table then permanently missed it. With it the
    // row survives the probe, the corpus id-presence check skips the
    // re-append, and the missing fp row is written.
    assert(DedupIndex.ingestBatch(b2, corpus, index) == 0L,
      "replay must not re-append corpus rows")
    assert(spark.read.parquet(corpus).count() == 3L, "no duplicate corpus rows")
    assert(spark.read.parquet(fpDir).where($"id" === 3L).count() == 1L,
      "the crashed batch's fp row must land on replay")
    // the healed fp probe drops a later exact duplicate (new id, same
    // text) — the boilerplate case the fp table exists to cover even
    // when every band bucket is over the cap
    assert(DedupIndex.ingestBatch(
      Seq((9L, tC, "s3")).toDF("doc_id", "text", "source"), corpus, index) == 0L)
    // the replay's duplicate sig/bands rows are healed durably
    DedupIndex.compact(spark, index)
    assert(spark.read.parquet(s"$index/sig").where($"id" === 3L).count() == 1L)
    assert(spark.read.parquet(s"$index/bands").select("id", "band_idx")
      .where($"id" === 3L).distinct().count() ==
      spark.read.parquet(s"$index/bands").where($"id" === 3L).count())
  }

  test("params pin: a first pin that crashed mid-write (uncommitted residue) heals on the next ingest") {
    val (corpus, index) = dirs()
    val residue = java.nio.file.Paths.get(index, "params", "_temporary", "0")
    java.nio.file.Files.createDirectories(residue)
    java.nio.file.Files.write(residue.resolve("junk"), "x".getBytes("UTF-8"))
    // the wedge would be an opaque schema-inference error here
    assert(DedupIndex.ingestBatch(
      Seq((1L, tA, "s1")).toDF("doc_id", "text", "source"),
      corpus, index) == 1L)
    // and the re-pin is real: different params now refuse
    val e = intercept[IllegalArgumentException] {
      DedupIndex.probeBatch(
        Seq((2L, tB, "s1")).toDF("doc_id", "text", "source"),
        spark.read.parquet(corpus), index,
        params = DedupIndex.Params(shingleN = 5))
    }
    assert(e.getMessage.contains("was built with"))
  }

  test("params pin: an out-of-band rebuild (another process) is re-read, not validated from the stale cached pin") {
    val (corpus, index) = dirs()
    // pins the default params in this JVM's memo
    DedupIndex.ingestBatch(Seq((1L, tA)).toDF("doc_id", "text"), corpus, index)
    // simulate ANOTHER process deleting and rebuilding the index with
    // different params while this JVM's cache still holds the old pin:
    // rewrite the params dir directly, bypassing this JVM's API — at
    // the next check the dir EXISTS, so a bare fs-exists revalidation
    // would wrongly validate against the dead pin and silently miss
    // duplicates; the metadata fingerprint catches the rewrite
    val pDir = s"$index/params"
    val hp = new org.apache.hadoop.fs.Path(pDir)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    Seq((3, 128, 16, 64)).toDF("shingle_n", "num_perm", "bands", "n_mods")
      .coalesce(1).write.parquet(pDir)
    val e = intercept[IllegalArgumentException] {
      DedupIndex.probeBatch(Seq((2L, tB)).toDF("doc_id", "text"),
        spark.read.parquet(corpus), index)
    }
    assert(e.getMessage.contains("silently miss"))
    // and probing with the REBUILT params is accepted (the re-pin)
    DedupIndex.probeBatch(Seq((2L, tB)).toDF("doc_id", "text"),
      spark.read.parquet(corpus), index,
      params = DedupIndex.Params(numPerm = 128))
  }

  test("cross-process writer lease: compact refused under a live foreign lease, allowed under our own, stale reclaimed; ingest heartbeats") {
    val (corpus, index) = dirs()
    DedupIndex.ingestBatch(
      Seq((1L, tA), (2L, tB)).toDF("doc_id", "text"), corpus, index)
    // a SECOND process's live writer lease: compact must refuse — the
    // swap under its in-flight ingest would lose the append
    val lease = java.nio.file.Paths.get(index, "_lease")
    java.nio.file.Files.write(lease, "99999@other-host".getBytes("UTF-8"))
    val e = intercept[IllegalStateException] {
      DedupIndex.compact(spark, index)
    }
    assert(e.getMessage.contains("another process"))
    // ingest heartbeats are OWN-only: a lease-free writer sharing the
    // dir must NOT resurrect a crashed foreign writer's marker forever
    // (that would refuse all maintenance and every new acquire past
    // any TTL) — the foreign mtime stays where it was
    java.nio.file.Files.setLastModifiedTime(lease,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 60000L))
    DedupIndex.ingestBatch(Seq((3L, tC)).toDF("doc_id", "text"),
      corpus, index)
    assert(java.nio.file.Files.getLastModifiedTime(lease).toMillis <=
      System.currentTimeMillis() - 30000L,
      "a foreign lease must not be refreshed by a lease-free ingest")
    // OUR OWN held lease IS refreshed by every ingest
    java.nio.file.Files.delete(lease)
    graft.ops.Lease.acquire(spark, index)
    java.nio.file.Files.setLastModifiedTime(lease,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 60000L))
    DedupIndex.ingestBatch(
      Seq((4L, "a separate novel body for the heartbeat check"))
        .toDF("doc_id", "text"), corpus, index)
    assert(java.nio.file.Files.getLastModifiedTime(lease).toMillis >
      System.currentTimeMillis() - 30000L,
      "ingest must refresh the holder's own heartbeat")
    // the holder's OWN process may maintain under its lease (a process
    // cannot race itself; the lease keeps excluding everyone else)
    DedupIndex.compact(spark, index)
    assert(java.nio.file.Files.exists(lease), "own-lease compact must not release it")
    graft.ops.Lease.release(spark, index)
    // a stale foreign lease (crashed writer) is reclaimed and compact
    // proceeds; the marker is gone after
    java.nio.file.Files.write(lease, "99999@other-host".getBytes("UTF-8"))
    java.nio.file.Files.setLastModifiedTime(lease,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()
        - graft.ops.Lease.DefaultTtlMs - 60000L))
    DedupIndex.compact(spark, index)
    assert(!java.nio.file.Files.exists(lease))
    // FENCING: a writer that ACQUIRED, then lost the lease to a
    // reclaimer (>TTL stall), aborts its next ingest instead of
    // appending as a zombie under the new holder (the hadoop write
    // keeps the checksum sidecar consistent for the read)
    graft.ops.Lease.acquire(spark, index)
    val hfs = new org.apache.hadoop.fs.Path(s"$index/_lease")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hout = hfs.create(new org.apache.hadoop.fs.Path(s"$index/_lease"), true)
    try hout.write(
      s"99999@other-host\n${System.currentTimeMillis()}".getBytes("UTF-8"))
    finally hout.close()
    val fe = intercept[IllegalStateException] {
      DedupIndex.ingestBatch(
        Seq((9L, "a zombie batch that must never land"))
          .toDF("doc_id", "text"), corpus, index)
    }
    assert(fe.getMessage.contains("fenced"))
    // release drops the fencing registration without touching the new
    // holder's marker; the now-lease-free writer is never fenced again
    graft.ops.Lease.release(spark, index)
    assert(java.nio.file.Files.exists(lease))
    hfs.delete(new org.apache.hadoop.fs.Path(s"$index/_lease"), false): Unit
  }
}
