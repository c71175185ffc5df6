package graft.ops

import java.nio.file.{Files, Paths}
import java.util.concurrent.TimeUnit

import org.scalatest.funsuite.AnyFunSuite

/** The lease under TRUE cross-process concurrency: a second real JVM
  * (`graft.dev.LeaseHoldMain`, Spark-free — sub-second startup)
  * acquires, holds, heartbeats, abandons, and contends for the lease
  * on a shared directory. This is the proof the in-process specs
  * cannot give: refusal against a live FOREIGN process, stale reclaim
  * of a genuinely crashed process's marker, and acquire mutual
  * exclusion between two racing JVMs. */
class LeaseTwoProcessSpec extends AnyFunSuite {
  private val conf = new org.apache.hadoop.conf.Configuration()

  private def tmpDir(): String =
    Files.createTempDirectory("graft_lease_2p_").resolve("guarded").toString

  private def marker(dir: String) = Paths.get(dir, "_lease")

  private def fork(args: String*): Process = {
    val java = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    new ProcessBuilder(
        (Seq(java, "-cp", cp, "graft.dev.LeaseHoldMain") ++ args): _*)
      .inheritIO()
      .start()
  }

  private def awaitMarker(dir: String, timeoutMs: Long = 30000L): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!Files.exists(marker(dir)) &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(50L)
    assert(Files.exists(marker(dir)),
      s"forked holder never produced a marker under $dir")
  }

  test("a live lease HELD BY ANOTHER PROCESS refuses acquire and maintenance; its release frees the dir") {
    val dir = tmpDir()
    // child: acquire, heartbeat every 200 ms for 6 s, release
    val child = fork(dir, "hold-release", "6000", "600000")
    try {
      awaitMarker(dir)
      val e = intercept[IllegalStateException] {
        Lease.acquire(conf, dir, Lease.DefaultTtlMs, "writer")
      }
      assert(e.getMessage.contains("another process"),
        s"expected the cross-process refusal, got: ${e.getMessage}")
      var ran = false
      intercept[IllegalStateException] {
        Lease.withHeld(conf, dir, Lease.DefaultTtlMs, "maintenance") {
          ran = true
        }
      }
      assert(!ran, "maintenance must not fold under a foreign process's lease")
      // and we are not the holder — the fencing signal
      assert(!Lease.heartbeatIfHeld(conf, dir))
      assert(child.waitFor(60, TimeUnit.SECONDS), "forked holder hung")
      assert(child.exitValue() == 0, s"holder exited ${child.exitValue()}")
      assert(!Files.exists(marker(dir)),
        "the holder's release must remove its marker")
      // the dir is free: acquire succeeds now
      Lease.acquire(conf, dir, Lease.DefaultTtlMs, "writer")
      Lease.release(conf, dir)
    } finally if (child.isAlive) child.destroyForcibly(): Unit
  }

  test("a CRASHED process's lease (no release, no heartbeats) refuses while fresh, then reclaims after the TTL") {
    val dir = tmpDir()
    val child = fork(dir, "acquire-exit", "0", "600000")
    assert(child.waitFor(60, TimeUnit.SECONDS), "forked crasher hung")
    assert(child.exitValue() == 0)
    assert(Files.exists(marker(dir)), "the crasher must leave its marker")
    // fresh (the child just wrote it): a generous TTL refuses
    intercept[IllegalStateException] {
      Lease.acquire(conf, dir, 600000L, "writer")
    }
    // past a short TTL the dead process's lease reclaims and the fold runs
    Thread.sleep(2500L)
    var ran = false
    Lease.withHeld(conf, dir, 2000L, "maintenance") { ran = true }
    assert(ran, "maintenance must reclaim a stale crashed-process lease")
    assert(!Files.exists(marker(dir)),
      "the reclaimed-and-released marker must be gone")
  }

  test("streaming maintenance vs a REAL second process: curationCompact refuses while the other JVM holds the lease, runs once it releases, and reclaims a crashed one") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val pipeDir = tmpDir()
    val batch = Seq((1L, "two process lease test document body", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    graft.streaming.StreamOps.dataCardIngestBatch(batch, s"$pipeDir/card", 0L)
    graft.streaming.StreamOps.fpDedupIngestBatch(batch, s"$pipeDir/corpus"): Unit
    // a real second JVM is the pipeline's writer (heartbeats for 8 s)
    val child = fork(pipeDir, "hold-release", "8000", "600000")
    try {
      awaitMarker(pipeDir)
      val e = intercept[IllegalStateException] {
        graft.streaming.StreamOps.curationCompact(spark, pipeDir)
      }
      assert(e.getMessage.contains("another process"))
      assert(child.waitFor(60, TimeUnit.SECONDS) && child.exitValue() == 0)
      // writer gone (released): maintenance folds now
      graft.streaming.StreamOps.curationCompact(spark, pipeDir): Unit
      assert(!Files.exists(marker(pipeDir)),
        "maintenance must release the lease it held for the fold")
      // and a CRASHED second writer's lease reclaims after its TTL
      val crasher = fork(pipeDir, "acquire-exit", "0", "600000")
      assert(crasher.waitFor(60, TimeUnit.SECONDS) && crasher.exitValue() == 0)
      Thread.sleep(2500L)
      graft.streaming.StreamOps.curationCompact(spark, pipeDir,
        leaseTtlMs = 2000L): Unit
      assert(!Files.exists(marker(pipeDir)))
    } finally if (child.isAlive) child.destroyForcibly(): Unit
  }

  test("parity store vs a REAL second process: ingest/stage refuse while the other JVM holds the root lease, run once it releases") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val root = tmpDir()
    val store = new graft.store.Store(spark, root, "c2p")
    store.initialize()
    val df = Seq((1, "a"), (2, "b")).toDF("row", "label")
    store.ingest(df, "1.1",
      ingestTs = java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
    // a real second JVM holds the STORE ROOT lease for 6 s
    val child = fork(root, "hold-release", "6000", "600000")
    try {
      awaitMarker(root)
      val e1 = intercept[IllegalStateException] {
        store.ingest(df, "2.1",
          ingestTs = java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
      }
      assert(e1.getMessage.contains("another process"))
      val e2 = intercept[IllegalStateException] { store.stage() }
      assert(e2.getMessage.contains("another process"))
      // reads stay lease-free while the foreign writer lives
      assert(store.readLog().count() == 1L)
      assert(child.waitFor(60, TimeUnit.SECONDS) && child.exitValue() == 0)
      // writer gone (released): the refused verbs run now, data intact
      store.ingest(df, "2.1",
        ingestTs = java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
      store.stage()
      assert(!Files.exists(marker(root)),
        "every store verb must release the lease on the way out")
      assert(store.readProd().count() == 4L)
    } finally if (child.isAlive) child.destroyForcibly(): Unit
  }

  test("substr index vs a REAL second process: compact refuses while the other JVM holds the lease; lease-free ingest keeps working") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val idx = tmpDir()
    val p = graft.text.SubstrIndex.Params(minTokens = 3)
    graft.text.SubstrIndex.ingestBatch(
      Seq((1L, "a b c d e")).toDF("doc_id", "text"), idx, params = p).count()
    val child = fork(idx, "hold-release", "6000", "600000")
    try {
      awaitMarker(idx)
      val e = intercept[IllegalStateException] {
        graft.text.SubstrIndex.compact(spark, idx)
      }
      assert(e.getMessage.contains("another process"))
      // lease-FREE ingest keeps working under the foreign holder (it
      // never acquired, so it is never fenced — the writer contract is
      // the caller's; only maintenance must quiesce)
      graft.text.SubstrIndex.ingestBatch(
        Seq((2L, "f g h i j")).toDF("doc_id", "text"), idx, params = p).count()
      assert(child.waitFor(60, TimeUnit.SECONDS) && child.exitValue() == 0)
      // holder released: maintenance folds now and releases after
      assert(graft.text.SubstrIndex.compact(spark, idx).nonEmpty)
      assert(!Files.exists(marker(idx)))
    } finally if (child.isAlive) child.destroyForcibly(): Unit
  }

  test("two processes racing acquire: exactly one wins") {
    val dir = tmpDir()
    val c1 = fork(dir, "contend", "0", "600000")
    val c2 = fork(dir, "contend", "0", "600000")
    assert(c1.waitFor(60, TimeUnit.SECONDS) && c2.waitFor(60, TimeUnit.SECONDS),
      "contender hung")
    val exits = Seq(c1.exitValue(), c2.exitValue())
    assert(exits.count(_ == 0) == 1 && exits.count(_ == 3) == 1,
      s"expected exactly one WON (0) and one LOST (3), got $exits")
    // the winner's marker survives (neither loser clobbered it)
    assert(Files.exists(marker(dir)))
    Files.delete(marker(dir))
  }
}
