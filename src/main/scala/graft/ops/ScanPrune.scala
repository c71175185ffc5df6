package graft.ops

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Point-set scan pruning for persisted-index probes: a probe that
  * looks up a batch-sized set of keys in a corpus-sized sorted parquet
  * table should read the PAGES those keys can touch, not the table.
  *
  * [[pointSetPredicate]] builds a balanced interval tree over the
  * probe's sorted key set: point-equality leaves (isin of <= `leaf`
  * values — small enough that Spark pushes them to parquet as ORs of
  * Eq, keeping point granularity for page min/max stats), internal
  * nodes guarded by their subtree's [min,max]. Parquet's column-index
  * filtering prunes whole subtrees per page, so with the table sorted
  * by the key and pages capped at [[PageRowLimit]] rows, touched pages
  * are bounded by the PROBE's key count, not the corpus — per-probe IO
  * goes flat once the table outgrows |keys| x page rows. Residual
  * (per-row) evaluation descends one guard branch: O(log |keys|).
  *
  * The predicate is EXACT (it selects precisely the probed keys), so
  * wiring it under an existing join/anti-join never changes results —
  * rows outside the probed key set could not have matched anyway.
  *
  * Two gates, both measured (COVERAGE round-11 WinnowIndex section):
  * building + codegen-compiling the literal tree costs ~1 s per probe,
  * so callers should engage it only above [[PushMinTableBytes]] (below
  * that a plain columnar scan is strictly cheaper); and key sets above
  * [[MaxPushKeys]] are refused by [[shouldPush]] — a 5000-leaf tree
  * stack-overflowed parquet's left-deep Or evaluation and whole-stage
  * codegen, and a uniform key set that size covers every page of any
  * realistic table anyway (no pruning power left).
  */
object ScanPrune {

  /** Key sets larger than this skip the pushdown (plan-size/codegen
    * safety; no pruning power left at this density). */
  val MaxPushKeys = 2048

  /** Tables smaller than this skip the pushdown (the ~1 s tree
    * build/codegen cost exceeds a full columnar scan). */
  val PushMinTableBytes: Long = 1L << 30

  /** Parquet page row cap for sorted index-table writes — the pruning
    * granularity: a probe touches at most |its keys| pages of this
    * many rows. Pass as `.option("parquet.page.row.count.limit", ...)`. */
  val PageRowLimit = 2000

  /** Total on-disk bytes under `dir` (driver-side metadata call). */
  def tableBytes(spark: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
  }

  /** On-disk compressed bytes of ONE column under `dir`, summed from
    * the parquet footers (driver-side metadata reads, no data pages).
    * The right size gate for probes over a FULL-ROW table: a 1 GB
    * corpus of ~1 KB documents holds only tens of MB of fingerprint
    * column, and the pushdown's ~1 s tree cost must be weighed against
    * the bytes the scan would actually read — the key column, not the
    * rows. Checked cheaply: callers should test [[tableBytes]] first
    * (total >= threshold is necessary for any column to reach it), so
    * the footer walk runs only on candidate tables. Files written by
    * crashed jobs are skipped — by name (`_`/`.` prefixed, non-parquet)
    * AND by [[FsPaths.committedUnder]]'s hidden-ancestor filter, since
    * an in-flight attempt under `_temporary/` carries a
    * committed-looking final name. */
  def columnBytes(spark: SparkSession, dir: String, colName: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return 0L
    var total = 0L
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && name.startsWith("part-") && name.endsWith(".parquet") &&
          FsPaths.committedUnder(fs, p, st.getPath)) {
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
        try {
          val blocks = r.getFooter.getBlocks.iterator()
          while (blocks.hasNext) {
            val cols = blocks.next().getColumns.iterator()
            while (cols.hasNext) {
              val c = cols.next()
              if (c.getPath.toDotString == colName)
                total += c.getTotalSize
            }
          }
        } finally r.close()
      }
    }
    total
  }

  /** Both gates at once: push iff the key set is tree-sized and the
    * table is big enough that pruning beats the tree's fixed cost. */
  def shouldPush(spark: SparkSession, dir: String, nKeys: Int): Boolean =
    nKeys > 0 && nKeys <= MaxPushKeys &&
      tableBytes(spark, dir) >= PushMinTableBytes

  /** Cached verdict of the COLUMN-size gate — the right gate for probes
    * over a FULL-ROW table, where [[tableBytes]] alone would engage the
    * ~1 s pushdown for a key column that is a sliver of the total. The
    * [[columnBytes]] footer walk opens every file, and between
    * compactions an absorbing-append table gains a file set per batch —
    * paying the walk per batch makes the gate itself O(files). The
    * verdict is monotone under the table's two writers (append grows
    * the column; compaction is a row-preserving rewrite), so TRUE is
    * sticky, and FALSE holds until the total size — already in hand
    * from the caller's cheap [[tableBytes]] precheck — grows ~12.5%
    * past the last measurement: walks amortize to O(log growth). A
    * table that SHRANK below half its measured size was deleted and
    * recreated in-process (tests do this); the entry drops and
    * remeasures. */
  private val columnGateCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (Long, Boolean)]()
  def columnGate(spark: SparkSession, dir: String, colName: String,
                 totalBytes: Long): Boolean = {
    val key = (dir, colName)
    val cached = columnGateCache.get(key)
    if (cached != null) {
      val (atCheck, verdict) = cached
      if (totalBytes >= atCheck / 2 &&
          (verdict || totalBytes < atCheck + atCheck / 8)) return verdict
    }
    val v = columnBytes(spark, dir, colName) >= PushMinTableBytes
    columnGateCache.put(key, (totalBytes, v))
    v
  }

  /** The one gated pushdown every index probe should use: returns
    * `scan` filtered to the probe's key point set when BOTH gates pass,
    * `scan` unchanged otherwise. `keys` is by-name so the driver
    * collect only runs once the (cheap, fs-metadata) size gate has
    * passed; nulls are dropped (a null key cannot equi-match any index
    * row, so excluding null-keyed index rows is exact); values are
    * deduped and sorted here; unsupported key types skip the pushdown
    * instead of crashing — the filter is an optimization, never a
    * correctness dependency. */
  def prunedScan(spark: SparkSession, dir: String,
                 scan: org.apache.spark.sql.DataFrame, keyCol: String,
                 keys: => Array[Any],
                 minTableBytes: Long = PushMinTableBytes)
      : org.apache.spark.sql.DataFrame = {
    if (tableBytes(spark, dir) < minTableBytes) return scan
    val ks = keys.filter(_ != null)
    if (ks.isEmpty || ks.length > MaxPushKeys) return scan
    ks.head match {
      case _: java.lang.Long =>
        scan.where(pointSetPredicate(
          ks.map(_.asInstanceOf[java.lang.Long].longValue)
            .distinct.sorted, col(keyCol)))
      case _: java.lang.Integer =>
        scan.where(pointSetPredicate(
          ks.map(_.asInstanceOf[java.lang.Integer].intValue)
            .distinct.sorted, col(keyCol)))
      case _: String =>
        // the tree's range guards evaluate under Spark's UTF-8 BINARY
        // ordering, but Ordering[String] sorts by UTF-16 code units —
        // the two disagree once keys mix [U+E000, U+FFFF] chars with
        // supplementary-plane chars, and a key sorted "into" the wrong
        // subtree would make its guard silently exclude matching rows.
        // ASCII orders identically under both, so gate on it and fall
        // back to the unpruned scan otherwise (the filter is an
        // optimization, never a correctness dependency).
        val ss = ks.map(_.asInstanceOf[String])
        if (ss.forall(_.forall(_ < 0x80)))
          scan.where(pointSetPredicate(ss.distinct.sorted, col(keyCol)))
        else scan
      case _ => scan
    }
  }

  /** [[prunedScan]] with the probe keys still a FRAME: collects them
    * through `limit(MaxPushKeys + 1)`, so an over-cap key set is
    * detected after at most cap+1 rows reach the driver instead of
    * collecting the whole batch's key column only to refuse it — the
    * hot-path form every per-ingest/per-probe caller should use (a
    * micro-batch routinely carries far more than [[MaxPushKeys]] keys,
    * and the old shape paid a full distinct+collect job per batch for
    * a pushdown that could never engage). When the limited collect
    * comes back at or under the cap it IS the complete distinct key
    * set, so exactness is unchanged. Runs nothing unless the (fs
    * metadata) size gate passes. */
  def prunedScanDf(spark: SparkSession, dir: String,
                   scan: org.apache.spark.sql.DataFrame, keyCol: String,
                   keysDf: org.apache.spark.sql.DataFrame,
                   minTableBytes: Long = PushMinTableBytes)
      : org.apache.spark.sql.DataFrame =
    prunedScan(spark, dir, scan, keyCol, {
      val sample = keysDf.limit(MaxPushKeys + 1).collect().map(_.get(0))
      if (sample.length > MaxPushKeys) Array.empty[Any] else sample
    }, minTableBytes)

  /** The balanced interval tree over a SORTED key array (Long or
    * String — both order identically in Spark and parquet stats for
    * the ASCII/hex keys the indexes use). `sorted` MUST be ascending
    * and distinct. */
  def pointSetPredicate[T](sorted: Array[T], c: Column,
                           leaf: Int = 8)
                          (implicit ord: Ordering[T]): Column = {
    require(leaf >= 1, s"pointSetPredicate: leaf must be >= 1, got $leaf")
    require(sorted.length <= 1 ||
      sorted.sliding(2).forall(p => ord.lt(p(0), p(1))),
      "pointSetPredicate: keys must be ascending and distinct")
    def build(lo: Int, hi: Int): Column = // [lo, hi)
      if (hi - lo <= leaf)
        c.isin(sorted.slice(lo, hi).map(_.asInstanceOf[AnyRef]).toSeq: _*)
      else {
        val mid = (lo + hi) >>> 1
        (c >= lit(sorted(lo))) && (c <= lit(sorted(hi - 1))) &&
          (build(lo, mid) || build(mid, hi))
      }
    if (sorted.isEmpty) lit(false) else build(0, sorted.length)
  }
}
