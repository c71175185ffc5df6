package graft.ops

/** The one hidden-path filter every driver-side directory walk must
  * share. `FileSystem.listFiles(dir, recursive = true)` surfaces files
  * under in-flight/crashed commit-protocol subtrees —
  * `_temporary/0/_temporary/attempt_N/part-00000-....parquet` — whose
  * FINAL name component looks exactly like a committed part file. Any
  * walk that checks only that last component (a presence gate, a file
  * count, a footer-bytes sum) silently counts uncommitted attempts: a
  * presence gate then answers "data exists" for a directory whose
  * parquet read will throw unable-to-infer-schema on every replay — the
  * precise wedged-stream failure those gates exist to prevent.
  *
  * Spark itself never sees those files because its scans apply a
  * hidden-path filter at EVERY ancestor level; this mirrors it: a file
  * is committed only if no directory strictly between `root` and the
  * file is `_`- or `.`-prefixed.
  */
object FsPaths {

  /** True iff no ancestor directory of `file` strictly below `root` is
    * hidden (`_`/`.`-prefixed). The file's own name is NOT checked here
    * — callers match it against their expected pattern (`part-*`,
    * `*.parquet`) which already excludes hidden names. Paths returned
    * by `listFiles` are fully qualified while callers routinely hold an
    * unqualified (possibly relative) `root`, so the root is qualified
    * through the caller's filesystem first and the comparison uses the
    * URI path component (scheme/authority-insensitive — both sides name
    * the same filesystem because one walk produced them). A file not
    * under `root` at all returns false. */
  def committedUnder(fs: org.apache.hadoop.fs.FileSystem,
                     root: org.apache.hadoop.fs.Path,
                     file: org.apache.hadoop.fs.Path): Boolean = {
    val rootPath = fs.makeQualified(root).toUri.getPath
    var p = file.getParent
    while (p != null && p.toUri.getPath != rootPath) {
      val n = p.getName
      if (n.startsWith("_") || n.startsWith(".")) return false
      p = p.getParent
    }
    p != null
  }

  /** Count of COMMITTED part files under `dir` (recursive, hidden
    * ancestors excluded) — the fs-metadata signal every maintenance
    * policy keys on: per-append file accumulation is what drifts scan
    * cost from data to file-open overhead, and this count is what a
    * compaction resets. 0 for a missing dir. */
  def committedPartCount(fs: org.apache.hadoop.fs.FileSystem,
                         dir: org.apache.hadoop.fs.Path): Long =
    committedPartStats(fs, dir)._1

  /** The COMMITTED part-file paths under `dir` (recursive, hidden
    * ancestors excluded, sorted for determinism) — the read-set
    * SNAPSHOT for a job that must read a directory it is itself about
    * to append to: constructing the scan from these explicit paths
    * pins the read set at listing time, so a re-listing (planner
    * re-plan, object-store listing inconsistency, a stage retry after
    * partial commit) can never pull the in-flight append into the
    * read. Empty for a missing dir. */
  def committedPartPaths(fs: org.apache.hadoop.fs.FileSystem,
                         dir: org.apache.hadoop.fs.Path): Seq[String] = {
    if (!fs.exists(dir)) return Nil
    val out = Seq.newBuilder[String]
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.getPath.getName.startsWith("part-") &&
          committedUnder(fs, dir, st.getPath))
        out += st.getPath.toString
    }
    out.result().sorted
  }

  /** (count, total bytes) of COMMITTED part files under `dir` — the
    * same walk as [[committedPartCount]] with the byte sum the
    * byte-aware maintenance policies key on: N files of 1 MB and N
    * files of 1 GB are different problems, and the mean committed file
    * size (bytes / count) against a compaction target tells them
    * apart from fs metadata alone. (0, 0) for a missing dir. */
  def committedPartStats(fs: org.apache.hadoop.fs.FileSystem,
                         dir: org.apache.hadoop.fs.Path): (Long, Long) = {
    if (!fs.exists(dir)) return (0L, 0L)
    val it = fs.listFiles(dir, true)
    var n = 0L
    var bytes = 0L
    while (it.hasNext) {
      val st = it.next()
      if (st.getPath.getName.startsWith("part-") &&
          committedUnder(fs, dir, st.getPath)) {
        n += 1
        bytes += st.getLen
      }
    }
    (n, bytes)
  }

  /** Per-LEAF-dir (count, bytes) of committed part files under `dir`,
    * keyed by each file's parent — the grain [[fileCountDue]]'s byte
    * rule evaluates at (compaction folds within a leaf dir, never
    * across). Same single recursive walk as [[committedPartStats]]. */
  def committedPartDirStats(fs: org.apache.hadoop.fs.FileSystem,
                            dir: org.apache.hadoop.fs.Path): Seq[(Long, Long)] = {
    if (!fs.exists(dir)) return Nil
    val acc = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.getPath.getName.startsWith("part-") &&
          committedUnder(fs, dir, st.getPath)) {
        val k = st.getPath.getParent.toUri.getPath
        val (n, b) = acc.getOrElse(k, (0L, 0L))
        acc.update(k, (n + 1L, b + st.getLen))
      }
    }
    acc.values.toSeq
  }

  /** The shared maintenance-due rule for file-counted components:
    * due on COUNT (total n >= maxFiles — file-open overhead drifting
    * scan cost away from data) or, when a `targetBytes` compaction
    * target is supplied (> 0), on BYTES — some LEAF directory holds
    * more than one file whose mean size is below HALF the target.
    *
    * Per-leaf-dir, because that is the grain compaction can fix: a
    * rewrite folds files WITHIN a (partition) dir, never across dirs,
    * so a hive-partitioned table legitimately holds one small file per
    * partition forever — a global mean would keep it due with no
    * actionable repair. The half matters for convergence: a compaction
    * packs a dir's bytes into ceil(bytes/target) files whose mean is
    * always >= target/2 (a single-file dir is excluded by n > 1), so
    * a fresh compaction never re-trips the policy it just satisfied.
    * targetBytes = 0 (the default everywhere) disables the byte rule:
    * counts alone, the pre-byte policy. */
  def fileCountDue(perDir: Seq[(Long, Long)], maxFiles: Int,
                   targetBytes: Long): Boolean =
    perDir.map(_._1).sum >= maxFiles ||
      (targetBytes > 0L && perDir.exists { case (n, bytes) =>
        n > 1L && bytes / n < targetBytes / 2 })

  /** The policy-OPERATIVE mean for a status row: the smallest
    * per-leaf-dir mean among multi-file dirs — the number
    * [[fileCountDue]]'s byte rule actually compares — falling back to
    * the global mean for tables with no multi-file leaf. Reporting the
    * global mean instead would show due=true next to a healthy-looking
    * number whenever one partition dir trips the rule while the others
    * hold large files, making the policy undiagnosable from `status`. */
  def operativeMeanBytes(perDir: Seq[(Long, Long)]): Long = {
    val multi = perDir.filter(_._1 > 1L)
    if (multi.nonEmpty) multi.map(t => t._2 / t._1).min
    else {
      val n = perDir.map(_._1).sum
      if (n == 0L) 0L else perDir.map(_._2).sum / n
    }
  }

  /** Metadata fingerprint of a directory's IMMEDIATE children: sorted
    * (name, length, mtime) triples, Nil for a missing dir. One
    * driver-side listStatus — the revalidation cost a memoized
    * params pin pays per check. A bare fs-exists is NOT enough: an
    * index deleted and rebuilt with different params BY ANOTHER
    * PROCESS leaves the params dir existing at check time, and the
    * stale cached pin would then validate probes against the dead
    * index's params — silently missing duplicates. Part-file names
    * carry write-unique UUIDs, so any rewrite changes the
    * fingerprint even inside one mtime tick. */
  def dirFingerprint(fs: org.apache.hadoop.fs.FileSystem,
                     dir: org.apache.hadoop.fs.Path): Seq[(String, Long, Long)] = {
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq
      .map(s => (s.getPath.getName, s.getLen, s.getModificationTime))
      .sortBy(_._1)
  }
}
