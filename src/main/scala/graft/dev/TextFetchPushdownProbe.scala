package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.ScanPrune
import graft.text.DedupIndex

/** Dev tool: evidence for the NEAR-dup probe's candidate-TEXT fetch
  * pushdown (`DedupIndex.probeBatch(corpusDir = Some(...))`) at gate
  * size — the round-13 verify stage whose correctness was oracle-gated
  * but whose above-gate IO win had no recorded number (the r13 nit).
  *
  * The exact-verify stage fetches candidate texts from the corpus by a
  * candidate-id semi-probe; the text column is the table's FAT column,
  * so once the corpus outgrows `ScanPrune.PushMinTableBytes` that fetch
  * is the probe's dominant IO. When the caller owns the corpus
  * DIRECTORY (the ingest path keeps it id-sorted with page-capped
  * rows; compactCorpus range-partitions it on the id), the candidate
  * id point set pushes down and the fetch reads only the pages those
  * ids can touch.
  *
  * Builds a corpus in the STEADY-STATE MAINTAINED layout (full doc
  * rows, id-RANGE-partitioned files, id-sorted within each file,
  * page-capped) with ~1.2 KB low-compressibility text per doc so the
  * dir clears the 1 GiB gate, indexes it with [[DedupIndex.buildFrom]],
  * then times the SAME `probeBatch` call with and without `corpusDir`
  * (A/B/A: plain, pushed, plain again) for a trickle batch that is
  * half near-dups (candidates that reach the text fetch) and half
  * novel. Survivor id sets are asserted identical — the pushdown is an
  * exact superset filter. Recorded in COVERAGE.md.
  * Usage: graft.dev.TextFetchPushdownProbe [nRows] [nProbe]
  */
object TextFetchPushdownProbe {
  def main(args: Array[String]): Unit = {
    val nRows = args.lift(0).map(_.toLong).getOrElse(1200000L)
    val nProbe = args.lift(1).map(_.toInt).getOrElse(1000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_textpush_").toString
    val corpus = s"$root/corpus"
    val index = s"$root/index"

    // ~1.2 KB/doc of hash-derived hex tokens: low-compressibility (the
    // gate measures on-disk bytes) and id-specific (distinct docs share
    // no shingle, so the only candidates are the constructed near-dups).
    // The body is a COLUMN expression — generation stays distributed.
    val body = (i: org.apache.spark.sql.Column) => concat(
      lit("document number "), i.cast("string"), lit(" "),
      expr("array_join(transform(sequence(0, 119), " +
        "j -> substring(md5(concat(cast(doc_id as string), '_', " +
        "cast(j as string))), 1, 9)), ' ')"))
    spark.range(nRows).toDF("doc_id")
      .withColumn("text", body(col("doc_id")))
      .repartitionByRange(32, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite")
      .option("parquet.page.row.count.limit", ScanPrune.PageRowLimit)
      .parquet(corpus)
    val dirGb = ScanPrune.tableBytes(spark, corpus) / 1e9
    println(f"[table] $nRows rows, dir=$dirGb%.2f GB, " +
      f"gate=${dirGb * 1e9 >= ScanPrune.PushMinTableBytes}")
    var t0 = System.nanoTime()
    val nIndexed = DedupIndex.buildFrom(spark.read.parquet(corpus), index,
      idCol = "doc_id", textCol = "text")
    println(f"[index] $nIndexed docs signed in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    // trickle batch: half near-dups of spread-out corpus docs (these
    // produce candidates and reach the text fetch), half novel
    val bases = (0 until nProbe / 2)
      .map(i => (i.toLong * 104729L) % nRows)
    val nearIds = bases.zipWithIndex
      .map { case (b, i) => (nRows * 10 + i, b) }
      .toDF("doc_id", "base_id")
    val near = nearIds.as("n")
      .join(spark.read.parquet(corpus).as("c"),
        col("n.base_id") === col("c.doc_id"))
      .select(col("n.doc_id").as("doc_id"),
        concat(col("c.text"), lit(" near variant tail")).as("text"))
    val novel = spark.range(nProbe / 2).toDF("k")
      .select((lit(nRows * 20) + col("k")).as("doc_id"))
      .withColumn("text", concat(lit("novel "), body(col("doc_id"))))
    val batch = near.unionByName(novel).localCheckpoint()
    println(s"[batch] ${batch.count()} docs (${nProbe / 2} near, ${nProbe / 2} novel)")

    val corpusDf = spark.read.parquet(corpus)
    corpusDf.select(col("doc_id")).count(): Unit // warm-up metadata/JIT
    def run(tag: String, dirOpt: Option[String]): Set[Long] = {
      t0 = System.nanoTime()
      val ids = DedupIndex.probeBatch(batch, corpusDf, index,
          corpusDir = dirOpt)
        .select(col("doc_id")).as[Long].collect().toSet
      println(f"[$tag%-7s] survivors=${ids.size} " +
        f"time=${(System.nanoTime() - t0) / 1e9}%.2f s")
      ids
    }
    val plain = run("plain", None)
    val pushed = run("pushed", Some(corpus))
    run("plain2", None): Unit // A/B/A: warm re-run of plain
    run("pushed2", Some(corpus)): Unit
    assert(plain == pushed,
      s"pushdown changed survivors: ${plain.size} vs ${pushed.size}")
    spark.stop()
  }
}
