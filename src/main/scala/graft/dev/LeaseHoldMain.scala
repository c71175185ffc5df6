package graft.dev

import org.apache.hadoop.conf.Configuration

/** Spark-free lease actor for the TWO-PROCESS integration test
  * (`LeaseTwoProcessSpec`): a second real JVM that acquires, holds,
  * heartbeats, contends for, or abandons a [[graft.ops.Lease]] on a
  * shared directory — so refusal, stale reclaim, and acquire mutual
  * exclusion are proven under true cross-process concurrency instead
  * of simulated foreign marker files. Uses the Configuration-level
  * lease API only (no SparkSession), so the forked JVM starts in
  * well under a second.
  *
  * Usage: LeaseHoldMain <dir> <mode> [holdMs] [ttlMs]
  *   hold-release  acquire, heartbeat every 200 ms for holdMs, release
  *   acquire-exit  acquire and exit WITHOUT releasing (crash writer)
  *   contend       acquire, settle 400 ms, verify the marker body is
  *                 still ours -> print WON / exit 0, else LOST / exit 3
  *                 (the settle absorbs the non-atomic-create window on
  *                 filesystems without exclusive create: of N racers
  *                 exactly one body survives, so exactly one WON)
  */
object LeaseHoldMain {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = args(1)
    val holdMs = args.lift(2).map(_.toLong).getOrElse(0L)
    val ttlMs = args.lift(3).map(_.toLong)
      .getOrElse(graft.ops.Lease.DefaultTtlMs)
    val conf = new Configuration()
    mode match {
      case "hold-release" =>
        graft.ops.Lease.acquire(conf, dir, ttlMs, "fork holder")
        val end = System.currentTimeMillis() + holdMs
        while (System.currentTimeMillis() < end) {
          graft.ops.Lease.heartbeatIfHeld(conf, dir): Unit
          Thread.sleep(200L)
        }
        graft.ops.Lease.release(conf, dir)
        println("RELEASED")
      case "acquire-exit" =>
        graft.ops.Lease.acquire(conf, dir, ttlMs, "fork crasher")
        println("ACQUIRED")
      // no release: simulates a writer that died holding the lease
      case "contend" =>
        val got =
          try { graft.ops.Lease.acquire(conf, dir, ttlMs, "fork contender"); true }
          catch { case _: IllegalStateException => false }
        if (got) Thread.sleep(400L)
        val stillOurs = got && graft.ops.Lease.heartbeatIfHeld(conf, dir)
        if (stillOurs) println("WON")
        else { println("LOST"); sys.exit(3) }
      case other =>
        System.err.println(s"LeaseHoldMain: unknown mode '$other'")
        sys.exit(2)
    }
  }
}
