package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Persisted winnow index: probe == the scan-form overlap on the same
  * corpus, incremental ingest, replay absorption, param pinning,
  * boilerplate cap. */
class WinnowIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp() = java.nio.file.Files
    .createTempDirectory("graft_winnow_idx_").toString + "/idx"

  private val boiler = "subscribe to our newsletter for updates every week"
  private def corpusDocs = Seq(
    (1L, s"the quick brown fox jumped over the lazy dog $boiler"),
    (2L, s"an entirely different body of prose about mountains $boiler"),
    (3L, "nothing shared here at all kumquat zephyr veldt fjord"))
    .toDF("doc_id", "text")

  test("probe matches the scan-form overlap on the same corpus") {
    val dir = tmp()
    assert(WinnowIndex.ingestBatch(spark, dir, corpusDocs,
      "doc_id", "text") == 3)
    // batch doc 10 shares the boilerplate passage with docs 1 and 2
    val batch = Seq((10L, s"fresh arrival with its own text $boiler"))
      .toDF("doc_id", "text")
    val viaIdx = WinnowIndex.probeBatch(spark, dir, batch,
        "doc_id", "text", minShared = 2, maxDocsPerHash = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // scan form on corpus + batch, restricted to pairs touching doc 10
    val scan = Winnow.overlap(corpusDocs.union(batch), "doc_id", "text",
        minShared = 2, maxDocsPerHash = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val scanTouching10 = scan.collect {
      case ((a, b), n) if b == 10L => (10L, a) -> n
      case ((a, b), n) if a == 10L => (10L, b) -> n
    }.toMap
    assert(viaIdx == scanTouching10 && viaIdx.nonEmpty)
    assert(viaIdx.keySet == Set((10L, 1L), (10L, 2L)))
  }

  test("ingest is incremental and replays are absorbed") {
    val dir = tmp()
    assert(WinnowIndex.ingestBatch(spark, dir,
      corpusDocs.where($"doc_id" <= 2), "doc_id", "text") == 2)
    assert(WinnowIndex.ingestBatch(spark, dir,
      corpusDocs, "doc_id", "text") == 1)  // only doc 3 is new
    assert(WinnowIndex.ingestBatch(spark, dir,
      corpusDocs, "doc_id", "text") == 0)  // full replay: nothing
    val batch = Seq((10L, s"padding words here $boiler"))
      .toDF("doc_id", "text")
    val pairs = WinnowIndex.probeBatch(spark, dir, batch, "doc_id", "text")
      .collect().map(_.getLong(1)).toSet
    assert(pairs == Set(1L, 2L)) // each corpus doc indexed exactly once
  }

  test("a first pin that crashed mid-write (uncommitted params residue) heals on the next ingest") {
    val dir = tmp()
    val residue = java.nio.file.Paths.get(dir, "params", "_temporary", "0")
    java.nio.file.Files.createDirectories(residue)
    java.nio.file.Files.write(residue.resolve("junk"), "x".getBytes("UTF-8"))
    // the wedge would be an opaque schema-inference error here
    assert(WinnowIndex.ingestBatch(spark, dir, corpusDocs,
      "doc_id", "text") == 3)
    // and the re-pin is real: different params now refuse
    val e = intercept[IllegalArgumentException] {
      WinnowIndex.probeBatch(spark, dir, corpusDocs, "doc_id", "text",
        params = WinnowIndex.Params(k = 3, w = 2))
    }
    assert(e.getMessage.contains("was built with"))
  }

  test("probing with different winnowing params throws") {
    val dir = tmp()
    WinnowIndex.ingestBatch(spark, dir, corpusDocs, "doc_id", "text",
      WinnowIndex.Params(k = 8, w = 4))
    val e = intercept[IllegalArgumentException] {
      WinnowIndex.probeBatch(spark, dir, corpusDocs, "doc_id", "text",
        WinnowIndex.Params(k = 5, w = 4))
    }
    assert(e.getMessage.contains("was built with"))
    // a DELETED-and-recreated index re-pins against the new dir — the
    // memoized pin must not validate against the dead index
    val hp = new org.apache.hadoop.fs.Path(dir)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    WinnowIndex.ingestBatch(spark, dir, corpusDocs, "doc_id", "text",
      WinnowIndex.Params(k = 5, w = 4))
    val e2 = intercept[IllegalArgumentException] {
      WinnowIndex.probeBatch(spark, dir, corpusDocs, "doc_id", "text",
        WinnowIndex.Params(k = 8, w = 4))
    }
    assert(e2.getMessage.contains("was built with"))
  }

  test("the per-hash doc cap drops corpus-wide boilerplate") {
    val dir = tmp()
    // 6 corpus docs all sharing the boilerplate
    val many = (1L to 6L).map(i => (i, s"unique lead $i $boiler"))
      .toDF("doc_id", "text")
    WinnowIndex.ingestBatch(spark, dir, many, "doc_id", "text")
    val batch = Seq((10L, s"incoming with $boiler")).toDF("doc_id", "text")
    val capped = WinnowIndex.probeBatch(spark, dir, batch, "doc_id", "text",
      minShared = 1, maxDocsPerHash = 2)
    assert(capped.count() == 0)
    val uncapped = WinnowIndex.probeBatch(spark, dir, batch, "doc_id", "text",
      minShared = 1, maxDocsPerHash = 50)
    assert(uncapped.count() == 6)
  }

  test("probe on an empty index returns an empty typed frame") {
    val dir = tmp()
    val out = WinnowIndex.probeBatch(spark, dir,
      corpusDocs, "doc_id", "text")
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("batch_id", "corpus_id", "n_shared"))
  }

  test("hashTreePredicate selects exactly the probed hashes, any size") {
    import org.apache.spark.sql.functions.col
    val table = (0L until 5000L).map(h => h * 37L).toDF("hash")
    for (n <- Seq(1, 7, 8, 9, 100)) {
      val probe = (0 until n).map(i => (i * 971L) % 5000L * 37L)
        .distinct.toArray.sorted
      val got = table
        .where(WinnowIndex.hashTreePredicate(probe, col("hash")))
        .as[Long].collect().sorted
      assert(got.toSeq == probe.toSeq, s"n=$n")
    }
    // non-members never match
    val miss = Array(1L, 38L, 184999L)
    assert(table.where(WinnowIndex.hashTreePredicate(miss, col("hash")))
      .count() == 0)
    assert(table.where(WinnowIndex.hashTreePredicate(Array.empty[Long],
      col("hash"))).count() == 0)
  }

  test("probe results are identical with and without the pushdown tree") {
    val dir = tmp()
    val many = (1L to 20L).map(i =>
      (i, s"unique lead $i about topic ${i % 3} $boiler"))
      .toDF("doc_id", "text")
    WinnowIndex.ingestBatch(spark, dir, many, "doc_id", "text")
    val batch = Seq((100L, s"incoming one $boiler"),
      (101L, "incoming two nothing shared kumquat zephyr"))
      .toDF("doc_id", "text")
    def run(maxDocs: Int) = WinnowIndex
      .probeBatch(spark, dir, batch, "doc_id", "text",
        minShared = 1, maxDocsPerHash = maxDocs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val withTree = run(50)
    // the big-batch path (tree skipped) is exercised via the scan-form
    // equivalence test above; here assert the tree path's exactness by
    // replaying the same probe against the raw table without pruning
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"$dir/fp")
    val bfp = Winnow.fingerprints(batch, "doc_id", "text")
      .select(col("hash"), col("doc_id").as("batch_id")).distinct()
    val expect = raw.join(bfp, "hash")
      .where(col("id") =!= col("batch_id"))
      .groupBy(col("batch_id"), col("id").as("corpus_id"))
      .agg(count(lit(1)).as("n_shared"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(withTree == expect && withTree.nonEmpty)
  }

  test("compact rewrites to one file per modulus and probes are unchanged") {
    val dir = tmp()
    // several ingests -> several files per modulus bucket
    (0 until 4).foreach { g =>
      val docs = (1L to 5L).map(i => (g * 10L + i,
        s"unique lead ${g * 10 + i} $boiler")).toDF("doc_id", "text")
      WinnowIndex.ingestBatch(spark, dir, docs, "doc_id", "text")
    }
    val batch = Seq((100L, s"incoming with $boiler")).toDF("doc_id", "text")
    val before = WinnowIndex.probeBatch(spark, dir, batch, "doc_id", "text",
      minShared = 1, maxDocsPerHash = 50)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    def fileCount = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/fp")
      val fsys = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fsys.listFiles(p, true)
      var n = 0
      while (it.hasNext) {
        if (it.next().getPath.getName.startsWith("part-")) n += 1
      }
      n
    }
    val filesBefore = fileCount
    // the maintenance policy keys on exactly the count compact resets
    def due(maxFiles: Int) = WinnowIndex
      .maintenanceDue(spark, dir, maxFiles = maxFiles)
      .where($"due").select("component").as[String].collect().toSet
    assert(due(maxFiles = filesBefore).contains("fp"))
    assert(!due(maxFiles = filesBefore + 10).contains("fp"))
    val rows = WinnowIndex.compact(spark, dir)
    assert(rows > 0)
    assert(fileCount < filesBefore, "compact must shrink the file count")
    assert(!due(maxFiles = filesBefore).contains("fp"), "compact re-arms the policy")
    val after = WinnowIndex.probeBatch(spark, dir, batch, "doc_id", "text",
      minShared = 1, maxDocsPerHash = 50)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(after == before && after.size == 20)
  }

  test("the ids manifest holds one row per doc and backfills for old indexes") {
    val dir = tmp()
    WinnowIndex.ingestBatch(spark, dir, corpusDocs, "doc_id", "text")
    val ids = spark.read.parquet(s"$dir/ids").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
    // pre-manifest index: drop ids/, the next ingest backfills it from
    // fp and replay dedup still holds
    val p = new org.apache.hadoop.fs.Path(s"$dir/ids")
    val fsys = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsys.delete(p, true)
    assert(WinnowIndex.ingestBatch(spark, dir, corpusDocs,
      "doc_id", "text") == 0, "backfilled manifest must absorb the replay")
    assert(spark.read.parquet(s"$dir/ids").as[Long].collect().sorted
      .toSeq == Seq(1L, 2L, 3L))
  }

  test("crash-window fp duplicates: probes dedup, compact heals durably") {
    val dir = tmp()
    WinnowIndex.ingestBatch(spark, dir, corpusDocs, "doc_id", "text")
    val batch = Seq((10L, s"incoming text $boiler")).toDF("doc_id", "text")
    def probe() = WinnowIndex.probeBatch(spark, dir, batch, "doc_id", "text",
        minShared = 1, maxDocsPerHash = 50)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val clean = probe()
    // simulate the ingest crash window (fp appended, ids not, replay
    // re-appends): duplicate every fp row
    val fpRows = spark.read.parquet(s"$dir/fp").localCheckpoint()
    val nDistinct = fpRows.count()
    fpRows.write.mode("append").partitionBy("fp_mod").parquet(s"$dir/fp")
    assert(spark.read.parquet(s"$dir/fp").count() == 2 * nDistinct)
    assert(probe() == clean,
      "duplicate (hash, id) rows must not inflate n_shared or cap counts")
    // compact rewrites distinct and rebuilds the manifest to match
    assert(WinnowIndex.compact(spark, dir) == nDistinct)
    assert(spark.read.parquet(s"$dir/fp").count() == nDistinct)
    assert(spark.read.parquet(s"$dir/ids").as[Long].collect().sorted
      .toSeq == Seq(1L, 2L, 3L))
    assert(probe() == clean)
  }

  test("a crash mid-compact heals on the next open") {
    val dir = tmp()
    WinnowIndex.ingestBatch(spark, dir, corpusDocs, "doc_id", "text")
    val conf = spark.sparkContext.hadoopConfiguration
    val fp = new org.apache.hadoop.fs.Path(s"$dir/fp")
    val fsys = fp.getFileSystem(conf)
    // simulate: crash after fp -> fp__old but before fp__tmp -> fp
    fsys.rename(fp, new org.apache.hadoop.fs.Path(s"$dir/fp__old"))
    val batch = Seq((10L, s"again $boiler")).toDF("doc_id", "text")
    val healed = WinnowIndex.probeBatch(spark, dir, batch, "doc_id", "text",
      minShared = 1, maxDocsPerHash = 50)
    assert(healed.count() == 2, "heal must restore the staged-aside table")
    // simulate: crash after ids -> ids__old but before ids__tmp -> ids
    val ids = new org.apache.hadoop.fs.Path(s"$dir/ids")
    fsys.rename(ids, new org.apache.hadoop.fs.Path(s"$dir/ids__old"))
    assert(WinnowIndex.ingestBatch(spark, dir, corpusDocs,
      "doc_id", "text") == 0, "heal must restore the staged-aside manifest")
    // simulate: leftover tmp from an interrupted rewrite
    fsys.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/fp__tmp"))
    fsys.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/ids__tmp"))
    assert(WinnowIndex.compact(spark, dir) > 0)
    Seq("fp__tmp", "fp__old", "ids__tmp", "ids__old").foreach { d =>
      assert(!fsys.exists(new org.apache.hadoop.fs.Path(s"$dir/$d")), d)
    }
  }

  test("cross-process writer lease: compact refused under a live foreign lease, allowed under our own") {
    val dir = tmp()
    assert(WinnowIndex.ingestBatch(spark, dir, corpusDocs,
      "doc_id", "text") == 3)
    val lease = java.nio.file.Paths.get(dir, "_lease")
    java.nio.file.Files.write(lease, "99999@other-host".getBytes("UTF-8"))
    val e = intercept[IllegalStateException] { WinnowIndex.compact(spark, dir) }
    assert(e.getMessage.contains("another process"))
    java.nio.file.Files.delete(lease)
    graft.ops.Lease.acquire(spark, dir)
    assert(WinnowIndex.compact(spark, dir) > 0) // own holder passes
    graft.ops.Lease.release(spark, dir)
  }
}
