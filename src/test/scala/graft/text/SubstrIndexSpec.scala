package graft.text

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The persisted exact-substring dedup index: sequential ingest equals
  * the batch operator, probe is pure, replays converge (including after
  * a crashed append), params pin, compaction fold + probe invariance,
  * and the writer-lease integration (heartbeat, refusal, fencing). */
class SubstrIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val P = SubstrIndex.Params(minTokens = 3)

  private def tmp(): String =
    Files.createTempDirectory("graft_substr_idx_").toString

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def cutMap(df: DataFrame): Map[Long, String] =
    df.as[(Long, String)].collect().toMap

  // batch 1 establishes spans; batch 2 copies across batches, repeats
  // within itself, and carries untouched docs
  private val batch1 = Seq(
    1L -> "a b c d e x",
    2L -> "p q r s t",
    3L -> "")
  private val batch2 = Seq(
    10L -> "m m a b c d e z",        // copies batch 1's span
    11L -> "p q r s t",              // exact copy of doc 2
    12L -> "k l k l k l k l",        // within-doc repeat
    13L -> "fresh words only here")  // untouched

  test("sequential ingest across batches == the batch operator over the union") {
    val dir = tmp()
    val c1 = cutMap(SubstrIndex.ingestBatch(docsDf(batch1), dir, params = P))
    val c2 = cutMap(SubstrIndex.ingestBatch(docsDf(batch2), dir, params = P))
    val expected = cutMap(TextOps.dedupSubstrings(
      docsDf(batch1 ++ batch2), "doc_id", "text", 3))
    assert(c1 ++ c2 == expected)
    // the interesting rows actually cut
    assert(c2(11L) == "")                       // whole-doc exact copy
    assert(!c2(10L).contains("a b c d e"))      // cross-batch span gone
    assert(c2(13L) == "fresh words only here")  // untouched verbatim
  }

  test("probeBatch cuts against the corpus without growing the index") {
    val dir = tmp()
    SubstrIndex.ingestBatch(docsDf(batch1), dir, params = P).count()
    val before = spark.read.parquet(s"$dir/grams").count()
    val probed = cutMap(SubstrIndex.probeBatch(docsDf(batch2), dir, params = P))
    assert(spark.read.parquet(s"$dir/grams").count() == before)
    // the probe cut equals the ingest cut for the same batch state
    val ingested = cutMap(SubstrIndex.ingestBatch(docsDf(batch2), dir, params = P))
    assert(probed == ingested)
    assert(spark.read.parquet(s"$dir/grams").count() > before)
  }

  test("a replayed batch returns the identical cut and appends nothing") {
    val dir = tmp()
    SubstrIndex.ingestBatch(docsDf(batch1), dir, params = P).count()
    val first = cutMap(SubstrIndex.ingestBatch(docsDf(batch2), dir, params = P))
    val n = spark.read.parquet(s"$dir/grams").count()
    val replay = cutMap(SubstrIndex.ingestBatch(docsDf(batch2), dir, params = P))
    assert(replay == first)
    assert(spark.read.parquet(s"$dir/grams").count() == n)
  }

  test("a replay after a CRASHED append (half the new gram files lost) heals and cuts identically") {
    val dir = tmp()
    SubstrIndex.ingestBatch(docsDf(batch1), dir, params = P).count()
    val gramsDir = java.nio.file.Paths.get(dir, "grams")
    def parts(): Seq[java.nio.file.Path] = {
      val s = java.nio.file.Files.list(gramsDir)
      try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.getFileName.toString.startsWith("part-"))
      finally s.close()
    }
    val old = parts().toSet
    val first = cutMap(SubstrIndex.ingestBatch(docsDf(batch2), dir, params = P))
    val full = spark.read.parquet(s"$dir/grams").count()
    val fresh = parts().filterNot(old.contains).sortBy(_.getFileName.toString)
    assert(fresh.nonEmpty)
    // crash simulation: half of the appended files never landed
    fresh.take(math.max(1, fresh.size / 2))
      .foreach(java.nio.file.Files.delete(_))
    assert(spark.read.parquet(s"$dir/grams").count() < full)
    val replay = cutMap(SubstrIndex.ingestBatch(docsDf(batch2), dir, params = P))
    assert(replay == first, "replay after a partial append must cut identically")
    assert(spark.read.parquet(s"$dir/grams").count() == full,
      "replay must re-append exactly the lost grams")
  }

  test("streaming form: per-batch cuts accumulate; the result equals the batch operator") {
    val dir = tmp()
    val out = s"${tmp()}/cut"
    val in = Files.createTempDirectory("graft_sidx_in_")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id LONG, text STRING")
    docsDf(batch1).coalesce(1).write.parquet(s"$in/f1")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$in/f*")
    val q = SubstrIndex.ingestStream(stream, dir, out, params = P).start()
    try {
      q.processAllAvailable()
      // the second batch arrives AFTER the first committed — the
      // deterministic id-ordered arrival the equivalence needs
      docsDf(batch2).coalesce(1).write.parquet(s"$in/f2")
      q.processAllAvailable()
    } finally q.stop()
    val got = cutMap(spark.read.parquet(out).select("id", "text"))
    assert(got == cutMap(TextOps.dedupSubstrings(
      docsDf(batch1 ++ batch2), "doc_id", "text", 3)))
  }

  test("probeBatch ignores id collisions: a probe doc reusing a corpus id still gets cut") {
    val dir = tmp()
    SubstrIndex.ingestBatch(docsDf(batch1), dir, params = P).count()
    // the eval set numbers its docs from 1 too — id 1 collides with the
    // corpus doc that owns the span's first occurrence
    val eval = docsDf(Seq(1L -> "a b c d e", 2L -> "clean eval row"))
    val got = cutMap(SubstrIndex.probeBatch(eval, dir, params = P))
    assert(got(1L) == "", "an id collision must not skip the cut on a pure probe")
    assert(got(2L) == "clean eval row")
  }

  test("a first pin that crashed mid-write (uncommitted params residue) heals on the next ingest") {
    val dir = tmp()
    val residue = java.nio.file.Paths.get(dir, "params", "_temporary", "0")
    java.nio.file.Files.createDirectories(residue)
    java.nio.file.Files.write(residue.resolve("junk"), "x".getBytes("UTF-8"))
    // the wedge would be an opaque schema-inference error here
    val got = cutMap(SubstrIndex.ingestBatch(docsDf(batch1), dir, params = P))
    assert(got.keySet == Set(1L, 2L, 3L))
    // and the re-pin is real: a different minTokens now refuses
    val e = intercept[IllegalArgumentException] {
      SubstrIndex.probeBatch(docsDf(batch2), dir,
        params = SubstrIndex.Params(minTokens = 4)).count()
    }
    assert(e.getMessage.contains("minTokens"))
  }

  test("params pin: a different minTokens is refused on reopen") {
    val dir = tmp()
    SubstrIndex.ingestBatch(docsDf(batch1), dir, params = P).count()
    val e = intercept[IllegalArgumentException] {
      SubstrIndex.probeBatch(docsDf(batch2), dir,
        params = SubstrIndex.Params(minTokens = 4)).count()
    }
    assert(e.getMessage.contains("minTokens"))
    intercept[IllegalArgumentException] {
      SubstrIndex.ingestBatch(docsDf(batch2), dir,
        params = SubstrIndex.Params(minTokens = 4)).count()
    }: Unit
  }

  test("compact folds the gram table, stays probe-invariant, and resets the policy") {
    val dir = tmp()
    // several single-batch appends -> several files
    batch1.foreach(d =>
      SubstrIndex.ingestBatch(docsDf(Seq(d)), dir, params = P).count())
    batch2.foreach(d =>
      SubstrIndex.ingestBatch(docsDf(Seq(d)), dir, params = P).count())
    val before = cutMap(SubstrIndex.probeBatch(docsDf(batch2), dir, params = P))
    val due = SubstrIndex.maintenanceDue(spark, dir, maxFiles = 3)
      .select("due").as[Boolean].head()
    assert(due, "several per-batch appends must trip the file-count policy")
    val stats = SubstrIndex.compact(spark, dir).get
    assert(stats.filesAfter < stats.filesBefore)
    assert(!SubstrIndex.maintenanceDue(spark, dir, maxFiles = 3)
      .select("due").as[Boolean].head())
    assert(cutMap(SubstrIndex.probeBatch(docsDf(batch2), dir, params = P))
      == before, "compact must be probe-invariant")
    // empty index: compact is a no-op None
    assert(SubstrIndex.compact(spark, tmp()).isEmpty)
  }

  test("writer lease: held writer heartbeats per batch; a foreign live lease refuses compact; a fenced writer aborts") {
    val dir = tmp()
    val conf = spark.sparkContext.hadoopConfiguration
    graft.ops.Lease.acquire(conf, dir, 60000L, "spec writer")
    try {
      SubstrIndex.ingestBatch(docsDf(batch1), dir, params = P).count()
      // still ours after the per-batch heartbeat
      assert(graft.ops.Lease.heartbeatIfHeld(conf, dir))
      // swap the marker to a foreign holder (through the hadoop fs so
      // the checksum sidecar stays readable): the writer is fenced
      val mp = new org.apache.hadoop.fs.Path(s"$dir/_lease")
      val hfs = mp.getFileSystem(conf)
      val out = hfs.create(mp, true)
      try out.write(
        s"99999@other-host\n${System.currentTimeMillis()}".getBytes("UTF-8"))
      finally out.close()
      val e = intercept[IllegalStateException] {
        SubstrIndex.ingestBatch(docsDf(batch2), dir, params = P).count()
      }
      assert(e.getMessage.contains("fenced"))
      // and a foreign LIVE lease refuses maintenance outright
      val e2 = intercept[IllegalStateException] {
        SubstrIndex.compact(spark, dir)
      }
      assert(e2.getMessage.contains("another process"))
    } finally graft.ops.Lease.release(conf, dir)
  }
}
