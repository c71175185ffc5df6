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
  * Content = `pid@host\nepochMillis`; the heartbeat refreshes the
  * mtime (one atomic driver `setTimes`) AND falls back to rewriting
  * the content epoch when the filesystem ignores `setTimes` (object
  * stores: S3A inherits the empty base implementation — an
  * mtime-only heartbeat there would silently never refresh and a live
  * writer would be "reclaimed" mid-append). Staleness therefore reads
  * `max(mtime, content epoch)`. A lease whose heartbeat is older than
  * the TTL belongs to a crashed writer and is reclaimed by an ATOMIC
  * rename-aside (two racing reclaimers cannot both win: one rename
  * succeeds, the loser refuses). Heartbeats land per micro-batch /
  * progress event (seconds), so the default ten minutes of silence is
  * a dead writer, not a slow one.
  *
  * Writers call [[acquire]] / heartbeat via [[heartbeatIfHeld]] /
  * [[release]]. Maintenance verbs run their fold inside [[withHeld]],
  * which HOLDS the lease for the duration — merely checking absence
  * would let a writer acquire and start appending mid-swap — and
  * passes through when the CALLER's process already holds it (a
  * process cannot race itself; in-process call discipline governs,
  * e.g. a policy-triggered auto-repair under the writer's own lease).
  * Heartbeat is refresh-ONLY and refreshes only OUR OWN lease — a
  * lease-free writer sharing the dir must not resurrect a crashed
  * writer's marker forever — so lease-free callers (single-process
  * deployments, tests, the verify oracles) pay one fs read and are
  * otherwise untouched. */
object Lease {

  /** Default heartbeat TTL — see the object doc. */
  val DefaultTtlMs: Long = 10L * 60L * 1000L

  private def path(dir: String) =
    new org.apache.hadoop.fs.Path(s"$dir/_lease")

  private def fsFor(spark: SparkSession, dir: String) =
    path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** This process's lease identity. Liveness is the heartbeat, not the
    * pid; the identity decides own-process pass-through (same pid@host
    * = same process = cannot race itself). */
  def holder(): String = {
    val pid = java.lang.ProcessHandle.current().pid()
    val host = try java.net.InetAddress.getLocalHost.getHostName
      catch { case _: java.net.UnknownHostException => "unknown-host" }
    s"$pid@$host"
  }

  /** (holder line, content epoch or -1) — "unknown" on any read
    * failure: the safe direction, an unknown FRESH lease refuses. */
  private def readLease(f: org.apache.hadoop.fs.FileSystem,
                        p: org.apache.hadoop.fs.Path): (String, Long) =
    try {
      val in = f.open(p)
      try {
        val buf = new Array[Byte](512)
        val n = in.read(buf)
        if (n <= 0) ("unknown", -1L)
        else {
          val lines = new String(buf, 0, n, "UTF-8").split("\n")
          val epoch = lines.lift(1).flatMap(_.trim.toLongOption).getOrElse(-1L)
          (lines(0).trim, epoch)
        }
      } finally in.close()
    } catch { case _: java.io.IOException => ("unknown", -1L) }

  private def leaseBody(): Array[Byte] =
    s"${holder()}\n${System.currentTimeMillis()}".getBytes("UTF-8")

  /** Heartbeat age from max(mtime, content epoch) — mtime alone is a
    * silent no-op to refresh on object stores. None = lease vanished
    * between the caller's exists and this read (a concurrent release):
    * treated as absent, never as an error. */
  private def ageMs(f: org.apache.hadoop.fs.FileSystem,
                    p: org.apache.hadoop.fs.Path): Option[Long] =
    try {
      val mtime = f.getFileStatus(p).getModificationTime
      val epoch = readLease(f, p)._2
      Some(System.currentTimeMillis() - math.max(mtime, epoch))
    } catch { case _: java.io.FileNotFoundException => None }

  /** Atomically take a STALE marker out of the way: rename-aside (one
    * winner) + delete the tombstone. False = lost the race. */
  private def reclaimStale(f: org.apache.hadoop.fs.FileSystem,
                           p: org.apache.hadoop.fs.Path,
                           dir: String): Boolean = {
    val tomb = new org.apache.hadoop.fs.Path(
      s"$dir/_lease.reclaim.${java.util.UUID.randomUUID().toString.take(8)}")
    val won = try f.rename(p, tomb)
      catch { case _: java.io.IOException => false }
    if (won) { try f.delete(tomb, false): Unit
      catch { case _: java.io.IOException => () } }
    won
  }

  /** Take the exclusive writer lease on `dir`. Refuses while a LIVE
    * lease exists (a second concurrent writer breaks the single-writer
    * replay contracts — even one in this same process); reclaims a
    * stale one loudly and atomically (rename-aside: two racing
    * reclaimers get exactly one winner). Create-exclusive, so two
    * racing acquirers cannot both win either. */
  def acquire(spark: SparkSession, dir: String,
              ttlMs: Long = DefaultTtlMs,
              what: String = "writer"): Unit = {
    require(ttlMs > 0L, s"Lease.acquire: ttlMs > 0, got $ttlMs")
    val f = fsFor(spark, dir)
    val p = path(dir)
    if (f.exists(p)) ageMs(f, p) match {
      case Some(age) if age <= ttlMs =>
        throw new IllegalStateException(
          s"$what lease on $dir refused: a live lease (heartbeated " +
            s"${age} ms ago, holder '${readLease(f, p)._1}') exists — " +
            "the holder may be active in another process, and a second " +
            "concurrent writer would break the single-writer contract. " +
            "Stop the other writer first, or wait out its lease.")
      case Some(age) =>
        System.err.println(
          s"[graft] reclaiming STALE $what lease on $dir " +
            s"(holder '${readLease(f, p)._1}', heartbeat ${age} ms old > " +
            s"ttl $ttlMs ms): treating the writer as crashed.")
        if (!reclaimStale(f, p, dir))
          throw new IllegalStateException(
            s"$what lease on $dir refused: lost the stale-lease reclaim " +
              "race to a concurrent acquirer.")
      case None => () // released concurrently — absent is what we want
    }
    val parent = p.getParent
    if (!f.exists(parent)) f.mkdirs(parent): Unit
    // overwrite = false: of two racing acquirers exactly one creates —
    // the loser's IOException becomes the same refusal contract
    val out =
      try f.create(p, false)
      catch {
        case e: java.io.IOException => throw new IllegalStateException(
          s"$what lease on $dir refused: lost the acquire race to a " +
            "concurrent writer (the marker appeared between the check " +
            "and the exclusive create).", e)
      }
    try out.write(leaseBody()) finally out.close()
  }

  /** Release the lease (no-op when absent — stop paths call it
    * unconditionally). Releases whatever marker is present: release is
    * only called from paths that acquired (or [[withHeld]]-hold) it. */
  def release(spark: SparkSession, dir: String): Unit = {
    val f = fsFor(spark, dir)
    val p = path(dir)
    try { if (f.exists(p)) f.delete(p, false): Unit }
    catch { case _: java.io.FileNotFoundException => () }
  }

  /** Refresh the heartbeat IF this process's own lease is held —
    * refresh-only (never creates: lease-free callers stay lease-free)
    * and own-only (a lease-free writer sharing the dir must not
    * resurrect a crashed writer's marker forever). setTimes first (one
    * atomic driver call); when the filesystem ignored it (object
    * stores), rewrite the content epoch instead — staleness reads
    * max(mtime, epoch), so either refresh counts. */
  def heartbeatIfHeld(spark: SparkSession, dir: String): Unit = {
    val f = fsFor(spark, dir)
    val p = path(dir)
    try {
      if (!f.exists(p) || readLease(f, p)._1 != holder()) return
      val now = System.currentTimeMillis()
      f.setTimes(p, now, -1)
      val applied =
        try f.getFileStatus(p).getModificationTime >= now - 1000L
        catch { case _: java.io.FileNotFoundException => true }
      if (!applied) {
        // object-store fallback: PUT a fresh body (new content epoch).
        // Readers race a PUT atomically (old or new object, never a
        // torn read) on stores; on local/HDFS setTimes already worked.
        val out = f.create(p, true)
        try out.write(leaseBody()) finally out.close()
      }
    } catch { case _: java.io.IOException => () } // next heartbeat retries
  }

  /** Run a maintenance fold HOLDING the lease: merely checking the
    * marker is absent would let a writer acquire it and start
    * appending in the middle of the fold's swap (and two maintenance
    * processes would race each other's rewrite). Pass-through when
    * this PROCESS already holds the lease — the owner cannot race
    * itself and keeps its lease; otherwise acquire (live foreign lease
    * refuses, stale reclaims — [[acquire]]'s contract) and release in
    * finally. */
  def withHeld[A](spark: SparkSession, dir: String,
                  ttlMs: Long = DefaultTtlMs,
                  what: String = "maintenance")(body: => A): A = {
    val f = fsFor(spark, dir)
    val p = path(dir)
    val ownAlready =
      try f.exists(p) && readLease(f, p)._1 == holder()
      catch { case _: java.io.FileNotFoundException => false }
    if (ownAlready) body
    else {
      acquire(spark, dir, ttlMs, what)
      try body finally release(spark, dir)
    }
  }
}
