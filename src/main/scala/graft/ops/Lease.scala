package graft.ops

import org.apache.spark.sql.SparkSession

/** The durable writer lease: what makes a "single writer, quiesced
  * maintenance" contract hold ACROSS PROCESSES. In-JVM checks
  * (`spark.streams.active`, documented call discipline) see only their
  * own application; on a real cluster two Spark jobs routinely share a
  * directory, and a compaction swapping a table out from under another
  * process's in-flight append loses the append with the old tree — the
  * exact corruption the quiesce contracts exist to prevent.
  *
  * Mechanics: an exclusive `_lease` marker file under the guarded
  * directory (hidden-prefixed, so every scan and walk ignores it).
  * Content = `pid@host` (diagnostics), heartbeat = mtime (one atomic
  * driver `setTimes` to refresh — no content rewrite, no partial
  * reads). A lease whose heartbeat is older than the TTL belongs to a
  * crashed writer and is reclaimable with a loud log; heartbeats land
  * per micro-batch / progress event (seconds), so the default ten
  * minutes of silence is a dead writer, not a slow one.
  *
  * Writers call [[acquire]] / heartbeat via [[heartbeatIfHeld]] /
  * [[release]]; maintenance verbs call [[requireAbsentOrStale]].
  * Heartbeat is refresh-ONLY (never creates), so lease-free callers —
  * single-process deployments, tests, the verify oracles — pay one
  * fs-exists and are otherwise untouched. */
object Lease {

  /** Default heartbeat TTL — see the object doc. */
  val DefaultTtlMs: Long = 10L * 60L * 1000L

  private def path(dir: String) =
    new org.apache.hadoop.fs.Path(s"$dir/_lease")

  private def fsFor(spark: SparkSession, dir: String) =
    path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** This process's lease identity (diagnostics only — liveness is the
    * heartbeat, not the pid). */
  def holder(): String = {
    val pid = java.lang.ProcessHandle.current().pid()
    val host = try java.net.InetAddress.getLocalHost.getHostName
      catch { case _: java.net.UnknownHostException => "unknown-host" }
    s"$pid@$host"
  }

  private def readHolder(f: org.apache.hadoop.fs.FileSystem,
                         p: org.apache.hadoop.fs.Path): String =
    try {
      val in = f.open(p)
      try {
        val buf = new Array[Byte](256)
        val n = in.read(buf)
        if (n <= 0) "unknown" else new String(buf, 0, n, "UTF-8")
      } finally in.close()
    } catch { case _: java.io.IOException => "unknown" }

  /** Take the exclusive writer lease on `dir`. Refuses while a LIVE
    * lease exists (a second concurrent writer breaks the single-writer
    * replay contracts); reclaims a stale one loudly. Create-exclusive,
    * so two racing acquirers cannot both win. */
  def acquire(spark: SparkSession, dir: String,
              ttlMs: Long = DefaultTtlMs,
              what: String = "writer"): Unit = {
    require(ttlMs > 0L, s"Lease.acquire: ttlMs > 0, got $ttlMs")
    val f = fsFor(spark, dir)
    val p = path(dir)
    if (f.exists(p)) {
      val age = System.currentTimeMillis() - f.getFileStatus(p).getModificationTime
      if (age <= ttlMs)
        throw new IllegalStateException(
          s"$what lease on $dir refused: a live lease (heartbeated " +
            s"${age} ms ago, holder '${readHolder(f, p)}') exists — a " +
            "second concurrent writer would break the single-writer " +
            "contract. Stop the other writer first, or wait out its lease.")
      System.err.println(
        s"[graft] reclaiming STALE $what lease on $dir " +
          s"(holder '${readHolder(f, p)}', heartbeat ${age} ms old > ttl " +
          s"$ttlMs ms): treating the writer as crashed.")
      f.delete(p, false): Unit
    }
    val parent = p.getParent
    if (!f.exists(parent)) f.mkdirs(parent): Unit
    // overwrite = false: of two racing acquirers (e.g. both reclaimed
    // the same stale lease above), exactly one creates — the loser's
    // IOException becomes the same refusal contract as a live lease
    val out =
      try f.create(p, false)
      catch {
        case e: java.io.IOException => throw new IllegalStateException(
          s"$what lease on $dir refused: lost the acquire race to a " +
            "concurrent writer (the marker appeared between the check " +
            "and the exclusive create).", e)
      }
    try out.write(holder().getBytes("UTF-8")) finally out.close()
  }

  /** Release the lease (no-op when absent — stop paths call it
    * unconditionally). */
  def release(spark: SparkSession, dir: String): Unit = {
    val f = fsFor(spark, dir)
    val p = path(dir)
    if (f.exists(p)) f.delete(p, false): Unit
  }

  /** Refresh the heartbeat IF a lease is held — refresh-only, never
    * create: lease-free callers stay lease-free. One atomic driver
    * setTimes; a transient IO failure is swallowed (the next heartbeat
    * retries well inside the TTL). */
  def heartbeatIfHeld(spark: SparkSession, dir: String): Unit = {
    val f = fsFor(spark, dir)
    val p = path(dir)
    try {
      if (f.exists(p)) f.setTimes(p, System.currentTimeMillis(), -1)
    } catch { case _: java.io.IOException => () }
  }

  /** The maintenance-side check: refuse while a LIVE lease exists (the
    * writer is streaming in another process — an append landing
    * mid-swap would be lost with the old tree), reclaim a stale one
    * loudly and proceed. `what` names the refusing verb in the error. */
  def requireAbsentOrStale(spark: SparkSession, dir: String,
                           ttlMs: Long = DefaultTtlMs,
                           what: String = "maintenance"): Unit = {
    val f = fsFor(spark, dir)
    val p = path(dir)
    if (!f.exists(p)) return
    // the holder's OWN process may maintain under its lease: a single
    // process cannot race itself (in-process call discipline — e.g.
    // VecIndex.appendWithPolicy's auto-rebalance — already governs),
    // and the held lease keeps excluding every OTHER process through
    // the maintenance. (A reused pid matching a DEAD writer's lease
    // proceeds too — which is the reclaim outcome anyway.)
    if (readHolder(f, p) == holder()) return
    val age = System.currentTimeMillis() - f.getFileStatus(p).getModificationTime
    if (age <= ttlMs)
      throw new IllegalStateException(
        s"$what on $dir refused: a live writer lease (_lease, " +
          s"heartbeated ${age} ms ago, holder '${readHolder(f, p)}') " +
          "exists — the writer is active in another process, and a " +
          "swap under its in-flight append would lose data. Stop that " +
          s"writer (or wait out the $ttlMs ms lease TTL if it crashed).")
    System.err.println(
      s"[graft] reclaiming STALE writer lease on $dir " +
        s"(holder '${readHolder(f, p)}', heartbeat ${age} ms old > ttl " +
        s"$ttlMs ms): treating the writer as crashed and proceeding " +
        s"with $what.")
    f.delete(p, false): Unit
  }
}
