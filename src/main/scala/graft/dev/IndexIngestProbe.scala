package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps
import graft.text.DedupIndex

/** Dev tool: per-batch ingest cost of continuous dedup, indexed vs
  * scan-everything, as the accumulated corpus grows. The claim under
  * test: [[StreamOps.dedupIngestBatch]] (re-reads + re-signs the corpus
  * every batch) has per-batch cost that GROWS with the corpus, while
  * [[DedupIndex.ingestBatch]] stays ~flat (band-table scan + candidate
  * fetches only). Synthesizes nBatches of docsPerBatch synthetic docs
  * (10% exact dups of earlier batches, 10% near dups, 80% novel),
  * ingests them sequentially through both paths, prints per-batch
  * seconds. Recorded in COVERAGE.md.
  * Usage: graft.dev.IndexIngestProbe [nBatches] [docsPerBatch] [modes]
  * (modes: comma list of indexed,scan,pipeline — scan at 10k docs/batch
  * takes tens of minutes BECAUSE of the blowup the index avoids; probe
  * it at a smaller docsPerBatch. `pipeline` drives the FULL near-dup
  * curation foreachBatch body — card partials + cap partials + heal +
  * DedupIndex ingest — i.e. curationPipelineStream(nearDedup=Some(...))
  * minus the row-local decontamination plan stage, whose cost
  * DecontGateProbe owns.)
  */
object IndexIngestProbe {
  def main(args: Array[String]): Unit = {
    val nBatches = args.lift(0).map(_.toInt).getOrElse(8)
    val perBatch = args.lift(1).map(_.toInt).getOrElse(20000)
    val modes = args.lift(2).getOrElse("indexed,scan").split(",").map(_.trim).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // deterministic synthetic docs: id decides novelty class and content
    def batchDf(b: Int) = {
      val start = b.toLong * perBatch
      spark.range(start, start + perBatch).toDF("doc_id")
        .withColumn("__cls", pmod(col("doc_id"), lit(10)))
        // dup classes (0=exact, 1=near) point at the batch-0 doc with the
        // same in-batch offset; everything else is genuinely novel (the
        // full id feeds the filler, so distinct ids share < J=0.3)
        .withColumn("__base",
          when(col("__cls") <= 1 && col("doc_id") >= perBatch,
            pmod(col("doc_id"), lit(perBatch)))
            .otherwise(col("doc_id")))
        .withColumn("text", concat(
          lit("synthetic document body number "), col("__base"),
          lit(" with shared filler words for shingling "),
          lit("alpha beta gamma delta epsilon "),
          expr("repeat(concat('tok', __base, ' '), 12)"),
          when(col("__cls") === 1 && col("doc_id") >= perBatch,
            lit("near variant tail")).otherwise(lit("original tail "))))
        .drop("__cls", "__base")
    }

    val root = java.nio.file.Files.createTempDirectory("graft_ingest_probe_")
    for (mode <- modes) {
      val corpus = s"$root/corpus_$mode"
      val index = s"$root/index_$mode"
      val pipe = s"$root/pipe_$mode"
      println(s"== $mode ==")
      for (b <- 0 until nBatches) {
        val df0 = batchDf(b)
        val df = (if (mode == "pipeline")
            df0.withColumn("lang", lit("en"))
              .withColumn("source",
                when(pmod(col("doc_id"), lit(2)) === 0, "web").otherwise("books"))
          else df0).localCheckpoint()
        val t0 = System.nanoTime()
        val n = mode match {
          case "indexed" => DedupIndex.ingestBatch(df, corpus, index)
          case "pipeline" =>
            // the curationPipelineStream(nearDedup) foreachBatch body
            StreamOps.dataCardIngestBatch(df, s"$pipe/card", b.toLong,
              dupSketch = true)
            StreamOps.sampleByIngestBatch(df, s"$pipe/cap", b.toLong,
              "source", "doc_id", k = 20)
            StreamOps.healPartials(spark, corpus)
            DedupIndex.ingestBatch(df, corpus, index)
          case _ => StreamOps.dedupIngestBatch(df, corpus)
        }
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"batch=$b%-2d appended=$n%-6d time=$sec%6.2fs")
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
    spark.stop()
  }
}
