package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.{DedupIndex, TextOps}

/** Dev tool: per-batch cost of the ROUND-8 default incremental-dedup
  * path — `DedupIndex.buildFrom` once, then pure `probeBatch` per
  * batch — as the corpus grows 1x -> 10x, vs the scan-everything
  * `dedupIncremental` on the same inputs. The claim under test: probe
  * cost is bounded by the batch and its candidates, so it stays FLAT
  * under corpus growth while the scan form grows linearly. Same
  * synthetic doc generator as [[IndexIngestProbe]] (shared boilerplate
  * filler, J~0.3 background). Recorded in COVERAGE.md.
  * Usage: graft.dev.ProbeFlatness [baseDocs] [batchDocs] [scales]
  */
object ProbeFlatness {
  def main(args: Array[String]): Unit = {
    val baseDocs = args.lift(0).map(_.toInt).getOrElse(50000)
    val batchDocs = args.lift(1).map(_.toInt).getOrElse(5000)
    val scales = args.lift(2).getOrElse("1,4,10").split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docs(start: Long, n: Long) =
      spark.range(start, start + n).toDF("doc_id")
        .withColumn("text", concat(
          lit("synthetic document body number "), col("doc_id"),
          lit(" with shared filler words for shingling "),
          lit("alpha beta gamma delta epsilon "),
          expr("repeat(concat('tok', doc_id, ' '), 12)"),
          lit("original tail ")))

    val root = java.nio.file.Files.createTempDirectory("graft_probe_flat_")
    // one batch reused at every scale: 10% exact dups of corpus docs
    // (base id = doc_id % baseDocs, in-corpus at every scale), 10% near
    // (same body, different tail), 80% novel
    val batch = docs(10_000_000L, batchDocs)
      .withColumn("__cls", pmod(col("doc_id"), lit(10)))
      .withColumn("__base", pmod(col("doc_id"), lit(baseDocs)))
      .withColumn("__dupText", concat(
        lit("synthetic document body number "), col("__base"),
        lit(" with shared filler words for shingling "),
        lit("alpha beta gamma delta epsilon "),
        expr("repeat(concat('tok', __base, ' '), 12)")))
      .withColumn("text",
        when(col("__cls") === 0, concat(col("__dupText"), lit("original tail ")))
          .when(col("__cls") === 1, concat(col("__dupText"), lit("near tail")))
          .otherwise(col("text")))
      .drop("__cls", "__base", "__dupText").localCheckpoint()

    for (scale <- scales) {
      val n = baseDocs.toLong * scale
      val corpusDir = s"$root/corpus_$scale"
      val indexDir = s"$root/index_$scale"
      val corpus = docs(0L, n)
      corpus.write.parquet(corpusDir)
      val corpusDf = spark.read.parquet(corpusDir)
      val t0 = System.nanoTime()
      DedupIndex.buildFrom(corpusDf, indexDir)
      val buildSec = (System.nanoTime() - t0) / 1e9
      def time(f: => Long): Double = {
        val t = System.nanoTime(); val c = f
        val s = (System.nanoTime() - t) / 1e9
        require(c > 0); s
      }
      val probeSecs = (1 to 3).map { _ =>
        time(DedupIndex.probeBatch(batch, corpusDf, indexDir).count())
      }
      // the scan form is the CONTRAST: one run only (it is the slow
      // path whose growth is being demonstrated), skippable via scales
      // where it would run for tens of minutes
      val scanSec =
        if (sys.env.get("SPARK_GRAFT_PROBE_SKIP_SCAN").exists(_.split(",").map(_.trim.toInt).contains(scale)))
          Double.NaN
        else time(TextOps.dedupIncremental(batch, corpusDf, "doc_id", "text").count())
      println(f"scale=${scale}%-3d corpus=$n%-8d build=$buildSec%6.1fs " +
        f"probe=${probeSecs.sorted.apply(1)}%6.2fs (runs ${probeSecs.map(x => f"$x%.2f").mkString(",")}) " +
        f"scan=$scanSec%6.2fs")
      System.out.flush()
    }
    spark.stop()
  }
}
