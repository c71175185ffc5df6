package graft.ops

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.scalatest.funsuite.AnyFunSuite

/** The lease's own durability contract (Configuration-level API — no
  * SparkSession needed): in-fold heartbeats keep a long maintenance
  * fold un-reclaimable past the TTL, release is own-only (a stalled
  * writer's late cleanup must not delete its successor's live lease),
  * and the heartbeat reports ownership (the managed writer's fencing
  * signal). Cross-process behavior under REAL concurrency is
  * LeaseTwoProcessSpec. */
class LeaseSpec extends AnyFunSuite {
  private val conf = new org.apache.hadoop.conf.Configuration()

  private def tmpDir(): String =
    Files.createTempDirectory("graft_lease_spec_").resolve("guarded").toString

  private def marker(dir: String) = Paths.get(dir, "_lease")

  test("withHeld heartbeats THROUGH a fold longer than the TTL: the lease stays live mid-fold and is released after") {
    val dir = tmpDir()
    // ttl 3 s, beats every ttl/4 = 750 ms: the 4x margin holds even
    // under the host's documented CPU-steal bursts (a 1 s TTL flaked
    // the margin when a burst delayed one beat past it)
    Lease.withHeld(conf, dir, 3000L, "maintenance") {
      Thread.sleep(6500L)
      // without the in-fold heartbeat the marker would now be 6.5 s
      // stale (> the 3 s TTL) and this acquire would RECLAIM the
      // lease mid-fold — the mid-swap corruption the lease exists to
      // prevent. With it, the acquire refuses on a LIVE lease.
      val e = intercept[IllegalStateException] {
        Lease.acquire(conf, dir, 3000L, "writer")
      }
      assert(e.getMessage.contains("live lease"),
        s"expected a live-lease refusal, got: ${e.getMessage}")
    }
    assert(!Files.exists(marker(dir)),
      "withHeld must release the lease it acquired after the fold")
    // and the dir is acquirable again
    Lease.acquire(conf, dir, 3000L, "writer")
    Lease.release(conf, dir)
    assert(!Files.exists(marker(dir)))
  }

  test("release is own-only: a foreign live marker survives our release") {
    val dir = tmpDir()
    Files.createDirectories(Paths.get(dir))
    Files.write(marker(dir),
      s"12345@elsewhere\n${System.currentTimeMillis()}".getBytes("UTF-8"))
    Lease.release(conf, dir)
    assert(Files.exists(marker(dir)),
      "release must not delete a lease we do not hold")
    assert(Files.readAllLines(marker(dir)).get(0) == "12345@elsewhere")
    Files.delete(marker(dir))
  }

  test("a stalled writer's late release leaves its successor's lease intact (reclaim + reacquire scenario)") {
    val dir = tmpDir()
    Files.createDirectories(Paths.get(dir))
    // OUR lease, gone stale (the >TTL GC pause / partition scenario):
    // both staleness signals — old mtime AND old content epoch
    val old = System.currentTimeMillis() - 3600000L
    Files.write(marker(dir), s"${Lease.holder()}\n$old".getBytes("UTF-8"))
    Files.setLastModifiedTime(marker(dir), FileTime.fromMillis(old))
    // another process reclaims it and acquires its own — simulate the
    // end state (LeaseTwoProcessSpec proves the reclaim itself)
    Files.delete(marker(dir))
    Files.write(marker(dir),
      s"99999@other-host\n${System.currentTimeMillis()}".getBytes("UTF-8"))
    // our finally-release fires late: it must delete NOTHING
    Lease.release(conf, dir)
    assert(Files.exists(marker(dir)) &&
      Files.readAllLines(marker(dir)).get(0) == "99999@other-host",
      "a stalled writer's release must not delete the new holder's lease")
    Files.delete(marker(dir))
  }

  test("heartbeatIfHeld reports ownership: absent=false, foreign=false (untouched), own=true and refreshed") {
    val dir = tmpDir()
    assert(!Lease.heartbeatIfHeld(conf, dir), "absent lease is not ours")
    Files.createDirectories(Paths.get(dir))
    val foreignBody = s"99999@other-host\n${System.currentTimeMillis()}"
    Files.write(marker(dir), foreignBody.getBytes("UTF-8"))
    assert(!Lease.heartbeatIfHeld(conf, dir), "foreign lease is not ours")
    assert(new String(Files.readAllBytes(marker(dir)), "UTF-8") == foreignBody,
      "heartbeat must not touch a foreign marker")
    Files.delete(marker(dir))
    Lease.acquire(conf, dir, Lease.DefaultTtlMs, "writer")
    // age the mtime, then heartbeat: ownership reported AND refreshed
    Files.setLastModifiedTime(marker(dir),
      FileTime.fromMillis(System.currentTimeMillis() - 300000L))
    assert(Lease.heartbeatIfHeld(conf, dir), "own lease is ours")
    val age = System.currentTimeMillis() -
      Files.getLastModifiedTime(marker(dir)).toMillis
    assert(age < 60000L, s"heartbeat must refresh the mtime, age $age ms")
    Lease.release(conf, dir)
  }

  test("withHeld passes through an already-held lease and keeps it held afterwards") {
    val dir = tmpDir()
    Lease.acquire(conf, dir, Lease.DefaultTtlMs, "writer")
    var ran = false
    Lease.withHeld(conf, dir, Lease.DefaultTtlMs, "maintenance") { ran = true }
    assert(ran)
    assert(Files.exists(marker(dir)),
      "pass-through must NOT release the owner's lease")
    assert(Files.readAllLines(marker(dir)).get(0) == Lease.holder())
    Lease.release(conf, dir)
    assert(!Files.exists(marker(dir)))
  }

  test("fenceIfLost: lease-free callers never fence; an acquirer whose lease was reclaimed throws; release clears the registration") {
    val dir = tmpDir()
    // lease-free: dir never acquired by this process -> plain heartbeat
    Lease.fenceIfLost(conf, dir) // no marker at all
    Files.createDirectories(Paths.get(dir))
    Files.write(marker(dir),
      s"99999@other-host\n${System.currentTimeMillis()}".getBytes("UTF-8"))
    Lease.fenceIfLost(conf, dir) // foreign marker, but we never acquired
    Files.delete(marker(dir))
    // acquired: the fence arms
    Lease.acquire(conf, dir, Lease.DefaultTtlMs, "writer")
    Lease.fenceIfLost(conf, dir) // ours -> refresh, no fence
    // another process reclaims + installs its own (hadoop write keeps
    // the checksum sidecar consistent so the read stays readable)
    val f = new org.apache.hadoop.fs.Path(s"$dir/_lease").getFileSystem(conf)
    val out = f.create(new org.apache.hadoop.fs.Path(s"$dir/_lease"), true)
    try out.write(
      s"99999@other-host\n${System.currentTimeMillis()}".getBytes("UTF-8"))
    finally out.close()
    val e = intercept[IllegalStateException] { Lease.fenceIfLost(conf, dir) }
    assert(e.getMessage.contains("fenced"))
    // release drops the registration (own-only: foreign marker stays) —
    // afterwards the same caller is lease-free again and never fenced
    Lease.release(conf, dir)
    assert(Files.exists(marker(dir)))
    Lease.fenceIfLost(conf, dir)
    Files.delete(marker(dir))
  }

  test("withHeld refuses a concurrent fold from ANOTHER THREAD of this process (the sibling would otherwise release under the first's fold)") {
    val dir = tmpDir()
    val inFold = new java.util.concurrent.CountDownLatch(1)
    val finish = new java.util.concurrent.CountDownLatch(1)
    val worker = new Thread(() => {
      Lease.withHeld(conf, dir, Lease.DefaultTtlMs, "maintenance") {
        inFold.countDown()
        finish.await()
      }
    })
    worker.start()
    assert(inFold.await(30, java.util.concurrent.TimeUnit.SECONDS))
    val e = intercept[IllegalStateException] {
      Lease.withHeld(conf, dir, Lease.DefaultTtlMs, "maintenance") {
        fail("the sibling fold must not run")
      }
    }
    assert(e.getMessage.contains("another thread"))
    finish.countDown()
    worker.join(30000L)
    assert(!worker.isAlive)
    assert(!Files.exists(marker(dir)),
      "the first fold's release must still happen")
    // free again: a fresh fold runs
    var ran = false
    Lease.withHeld(conf, dir, Lease.DefaultTtlMs, "maintenance") { ran = true }
    assert(ran)
  }

  test("withHeld releases on a fold failure (own-only), and a foreign LIVE lease refuses the fold without running it") {
    val dir = tmpDir()
    intercept[RuntimeException] {
      Lease.withHeld(conf, dir, Lease.DefaultTtlMs, "maintenance") {
        throw new RuntimeException("fold failed")
      }
    }
    assert(!Files.exists(marker(dir)),
      "a failed fold must still release the lease (no wedged marker)")
    Files.write(marker(dir),
      s"99999@other-host\n${System.currentTimeMillis()}".getBytes("UTF-8"))
    var ran = false
    intercept[IllegalStateException] {
      Lease.withHeld(conf, dir, Lease.DefaultTtlMs, "maintenance") { ran = true }
    }
    assert(!ran, "the fold must not run under a foreign live lease")
    Files.delete(marker(dir))
  }
}
