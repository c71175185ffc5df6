package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted winnowing-fingerprint index: incremental passage
  * attribution at corpus scale. [[Winnow.overlap]] re-fingerprints the
  * WHOLE corpus per run — O(corpus) CPU every time a new batch asks
  * "which existing documents share a passage with me?". This index
  * persists the corpus side's fingerprints once, so a batch probe
  * costs: fingerprint the (small) batch + one join against the
  * fingerprint table PRUNED to the hash-modulus buckets the batch
  * actually hits — the corpus is never re-fingerprinted and its text
  * never read. Same persisted-state discipline as [[DedupIndex]]
  * (whose probe cost is measured FLAT as the corpus grows —
  * IndexIngestProbe, COVERAGE.md); the table layout is identical in
  * kind: a 3-column parquet table partitioned by a hash modulus.
  *
  * Layout under `indexDir` (parquet, append-only):
  *  - `params/` one row (k, w, n_mods) — written at first ingest,
  *    CHECKED on reopen: probing with different winnowing parameters
  *    would silently miss shared passages, so a mismatch throws.
  *  - `fp/` partitioned by fp_mod = pmod(hash, n_mods): (hash, id) —
  *    DISTINCT per doc, so an in-doc repeated k-gram cannot multiply
  *    pair counts.
  *
  * Replay safety: [[ingestBatch]] drops batch ids already present in
  * the index (and in-batch duplicates), so a re-delivered batch
  * appends nothing — the vecIndexIngestBatch discipline.
  */
object WinnowIndex {

  final case class Params(k: Int = 8, w: Int = 4, nMods: Int = 64) {
    require(k >= 1 && w >= 1 && nMods >= 1,
      s"WinnowIndex: bad params (k=$k, w=$w, nMods=$nMods)")
  }

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def hasData(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && {
      val it = fs.listFiles(p, true)
      var found = false
      while (it.hasNext && !found) {
        val name = it.next().getPath.getName
        found = name.startsWith("part-") && !name.startsWith("_") && !name.startsWith(".")
      }
      found
    }
  }

  private def checkOrWriteParams(spark: SparkSession, indexDir: String,
                                 p: Params): Unit = {
    import spark.implicits._
    val dir = s"$indexDir/params"
    if (exists(spark, dir)) {
      val r = spark.read.parquet(dir).head()
      val stored = (r.getAs[Int]("k"), r.getAs[Int]("w"), r.getAs[Int]("n_mods"))
      require(stored == ((p.k, p.w, p.nMods)),
        s"WinnowIndex at $indexDir was built with (k, w, nMods) = $stored; " +
          s"probing with ${(p.k, p.w, p.nMods)} would silently miss passages")
    } else {
      Seq((p.k, p.w, p.nMods)).toDF("k", "w", "n_mods")
        .coalesce(1).write.parquet(dir)
    }
  }

  /** Distinct (fp_mod, hash, id) fingerprint rows for a batch — the
    * row-local kernel scan + one explode, positions collapsed. */
  private def fpRows(batch: DataFrame, idCol: String, textCol: String,
                     p: Params): DataFrame =
    Winnow.fingerprints(batch, idCol, textCol, p.k, p.w)
      .select(col("hash"), col(idCol).as("id")).distinct()
      .withColumn("fp_mod", pmod(col("hash"), lit(p.nMods.toLong)).cast("int"))

  /** Probe: for each batch doc, the corpus docs sharing >= `minShared`
    * DISTINCT fingerprint hashes — (batch_id, corpus_id, n_shared).
    * The fingerprint table scan is PRUNED to the batch's fp_mod
    * buckets; `maxDocsPerHash` drops boilerplate hashes by corpus-side
    * doc count (the [[Winnow.overlap]] cap, applied index-side). */
  def probeBatch(spark: SparkSession, indexDir: String, batch: DataFrame,
                 idCol: String, textCol: String, params: Params = Params(),
                 minShared: Int = 2, maxDocsPerHash: Int = 50): DataFrame = {
    require(minShared >= 1 && maxDocsPerHash >= 1,
      s"probeBatch: bad minShared=$minShared / maxDocsPerHash=$maxDocsPerHash")
    checkOrWriteParams(spark, indexDir, params)
    import spark.implicits._
    if (!hasData(spark, s"$indexDir/fp"))
      return Seq.empty[(Long, Long, Long)]
        .toDF("batch_id", "corpus_id", "n_shared")
        .select(col("batch_id").cast("long"), col("corpus_id").cast("long"),
          col("n_shared").cast("long"))
    // fingerprint the batch once; it feeds the mod-pruning literal set
    // and the hash join
    val bfp = fpRows(batch, idCol, textCol, params).localCheckpoint()
    val mods = bfp.select(col("fp_mod")).distinct().as[Int].collect().sorted
    val idx = spark.read.parquet(s"$indexDir/fp")
      .where(col("fp_mod").isin(mods.map(Integer.valueOf): _*))
    // restrict the index to the batch's hashes FIRST (one columnar scan
    // filtered through a broadcast hash join — no full-index shuffle,
    // no full-index aggregation: the probe's only corpus-sized work is
    // the scan itself). All rows of a surviving hash survive, so the
    // per-hash corpus doc counts computed on the RESTRICTED set are the
    // exact corpus-side counts the boilerplate cap needs.
    val cand = idx.join(broadcast(bfp.select(col("fp_mod"), col("hash"))
        .distinct()), Seq("fp_mod", "hash"))
      .localCheckpoint()
    val okHash = cand.groupBy(col("fp_mod"), col("hash"))
      .agg(count(lit(1)).as("__nd"))
      .where(col("__nd") <= maxDocsPerHash)
      .select(col("fp_mod"), col("hash"))
    cand.join(broadcast(okHash), Seq("fp_mod", "hash"), "left_semi")
      .join(broadcast(bfp.select(col("fp_mod"), col("hash"),
        col("id").as("batch_id"))), Seq("fp_mod", "hash"))
      .where(col("id") =!= col("batch_id"))
      .groupBy(col("batch_id"), col("id").as("corpus_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Ingest: append the batch's fingerprints (ids already in the index
    * and in-batch duplicate ids dropped — replays are absorbed).
    * Returns the number of NEW documents indexed. */
  def ingestBatch(spark: SparkSession, indexDir: String, batch: DataFrame,
                  idCol: String, textCol: String,
                  params: Params = Params()): Long = {
    checkOrWriteParams(spark, indexDir, params)
    val fresh0 = batch.dropDuplicates(idCol)
    val fresh =
      if (hasData(spark, s"$indexDir/fp"))
        fresh0.join(spark.read.parquet(s"$indexDir/fp")
            .select(col("id").as(idCol)).distinct(),
          Seq(idCol), "left_anti")
      else fresh0
    val rows = fpRows(fresh, idCol, textCol, params).localCheckpoint()
    val n = rows.select(col("id")).distinct().count()
    if (n > 0)
      // cluster on the partition column first: ONE file per modulus
      // bucket per ingest instead of one per (bucket, task) — without
      // this the table fragments into thousands of small files within a
      // few ingests and file-open overhead, not data, dominates probes
      rows.repartition(col("fp_mod"))
        .write.mode("append").partitionBy("fp_mod")
        .parquet(s"$indexDir/fp")
    n
  }
}
