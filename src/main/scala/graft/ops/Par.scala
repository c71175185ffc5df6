package graft.ops

/** Overlap INDEPENDENT Spark jobs from driver threads — the
  * overlap-independent-jobs discipline: Spark's scheduler runs several
  * jobs in one application happily, and sequential tiny writes/ingests
  * otherwise each pay their own job-submission + commit latency while
  * the executor pool sits idle through the other's tail. Callers pass
  * only MUTUALLY INDEPENDENT stages (disjoint output directories, no
  * ordering contract between them); each stage keeps its own
  * idempotent-replay discipline, so a crash mid-group leaves exactly
  * the any-subset-completed states a sequential run could. The first
  * failure is rethrown so the surrounding batch/query still fails. */
object Par {
  def inParallel(stages: (() => Unit)*): Unit =
    if (stages.sizeIs <= 1) stages.foreach(_.apply())
    else {
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val ts = stages.map { f =>
        val t = new Thread(() =>
          try f() catch { case e: Throwable => errs.add(e): Unit })
        t.setDaemon(true)
        t.start()
        t
      }
      // An interrupt of the CALLING thread (streaming query shutdown,
      // bench timeout cancel) must not return with workers still
      // writing in the background: a restarted/replayed micro-batch
      // could then overwrite the same batch_id directory CONCURRENTLY
      // with a zombie write — the idempotent-replay discipline only
      // holds when at most one writer touches a partial at a time. So
      // on interrupt, interrupt every worker and re-join them
      // UNINTERRUPTIBLY before rethrowing: the group never outlives the
      // call.
      var interrupted = false
      ts.foreach { t =>
        var joined = false
        while (!joined)
          try { t.join(); joined = true }
          catch {
            case _: InterruptedException =>
              interrupted = true
              ts.foreach(_.interrupt())
          }
      }
      if (interrupted) {
        Thread.currentThread().interrupt() // restore the flag
        throw new InterruptedException(
          "Par.inParallel interrupted; worker stages interrupted and joined")
      }
      val e = errs.peek()
      if (e != null) throw e
    }
}
