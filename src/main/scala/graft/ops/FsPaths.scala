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
                         dir: org.apache.hadoop.fs.Path): Long = {
    if (!fs.exists(dir)) return 0L
    val it = fs.listFiles(dir, true)
    var n = 0L
    while (it.hasNext) {
      val st = it.next()
      if (st.getPath.getName.startsWith("part-") &&
          committedUnder(fs, dir, st.getPath)) n += 1
    }
    n
  }
}
