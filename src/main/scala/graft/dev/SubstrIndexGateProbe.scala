package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.SubstrIndex

/** Dev tool: the SubstrIndex per-batch probe at GATE SIZE — the number
  * behind the index's 100 TB claim. Below [[graft.ops.ScanPrune]]'s
  * 1 GB gate a batch probe is a full columnar scan of the gram table
  * (cheap at that size, and the pushdown's ~1 s predicate-codegen cost
  * would dominate); above it, the probe pushes the batch's digest
  * point set so only the pages those digests can touch are read. The
  * claim under test: per-batch cost does NOT scale with the gram
  * table once the gate engages — the counterfactual plain join at the
  * same size shows what the batch would pay without it.
  *
  * Corpus text is synthetic (doc-unique token spaces -> every gram
  * unique, built through REAL `ingestBatch` calls so the layout is the
  * production one), sized so the big index clears 1 GB of gram bytes.
  * A/B/A per arm; warm mins reported (the first pushed call pays the
  * documented one-off predicate-codegen cost, billed separately).
  * Usage: graft.dev.SubstrIndexGateProbe [smallDocs] [bigDocs] [batchDocs]
  */
object SubstrIndexGateProbe {
  def main(args: Array[String]): Unit = {
    val smallDocs = args.lift(0).map(_.toInt).getOrElse(100000)
    val bigDocs = args.lift(1).map(_.toInt).getOrElse(1500000)
    val batchDocs = args.lift(2).map(_.toInt).getOrElse(2000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val p = SubstrIndex.Params(minTokens = 20)

    // 49 tokens -> 30 grams per doc; token space unique per (id+base),
    // so slices never collide and a dup is only a dup by construction
    def corpus(n: Int, idBase: Long): DataFrame =
      spark.range(n).select((col("id") + idBase).as("doc_id"),
        concat_ws(" ", expr(
          s"transform(sequence(0, 48), j -> concat('w', id + ${idBase}L, '_', j))"))
          .as("text"))

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    def buildIndex(nDocs: Int): String = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_sidx_gate_").toString
      // ingest in 3 slices (the real multi-batch layout), then compact
      val slice = nDocs / 3
      Seq(0, 1, 2).foreach { k =>
        SubstrIndex.ingestBatch(
          corpus(if (k < 2) slice else nDocs - 2 * slice, k.toLong * slice),
          dir, params = p).count(): Unit
      }
      SubstrIndex.compact(spark, dir): Unit
      dir
    }

    // probe batch: half corpus dups (ids far from the probe's own id
    // space -> real foreign hits), half fresh misses
    def probeBatchDf(): DataFrame =
      corpus(batchDocs / 2, 0L)
        .withColumn("doc_id", col("doc_id") + 90000000L) // foreign ids, dup text
        .unionByName(corpus(batchDocs / 2, 95000000L))   // fresh text

    // tiny batch: 60 docs -> ~1.8k distinct digests, UNDER MaxPushKeys,
    // so the point-set pushdown actually engages past the byte gate —
    // the decontamination-probe case (small eval set vs huge corpus)
    // where per-probe latency is the product
    def tinyBatchDf(): DataFrame =
      corpus(30, 0L).withColumn("doc_id", col("doc_id") + 90000000L)
        .unionByName(corpus(30, 95000000L))

    println(f"${"arm"}%-28s gram_GB  cut_docs  warm_min_s")
    Seq("small" -> smallDocs, "big" -> bigDocs).foreach { case (label, n) =>
      val dir = buildIndex(n)
      val gb = graft.ops.ScanPrune.tableBytes(spark, s"$dir/grams") / 1e9
      val batch = probeBatchDf().localCheckpoint()
      def run() = time(
        SubstrIndex.probeBatch(batch, dir, params = p)
          .agg(sum(length(col("text")))).collect(): Unit)
      val cold = run()
      val warm = Seq(run(), run()).min
      val cut = SubstrIndex.probeBatch(batch, dir, params = p)
        .where(length(col("text")) === 0).count()
      println(f"$label%-28s $gb%.2f     $cut%-9d $warm%.2f  (cold $cold%.2f)")

      val tiny = tinyBatchDf().localCheckpoint()
      def runTiny() = time(
        SubstrIndex.probeBatch(tiny, dir, params = p)
          .agg(sum(length(col("text")))).collect(): Unit)
      val coldT = runTiny()
      val warmT = Seq(runTiny(), runTiny()).min
      println(f"$label%-28s ${"(tiny batch, pushdown arm)"}%-19s $warmT%.2f  (cold $coldT%.2f)")

      // counterfactual at this size: the plain un-pushed join the probe
      // would pay without the gate (batch gk set vs full columnar scan)
      val gks = batch.select(
        explode(graft.functions.TextExpressions.word_shingles(
          graft.text.TextOps.tokens(col("text")), p.minTokens)).as("g"))
        .select(md5(col("g")).as("gk")).distinct().localCheckpoint()
      def plain() = time(
        spark.read.parquet(s"$dir/grams")
          .join(gks, Seq("gk"), "left_semi").count(): Unit)
      plain()
      println(f"$label%-28s ${"(plain-join counterfactual)"}%-19s ${Seq(plain(), plain()).min}%.2f")
    }
    spark.stop()
  }
}
