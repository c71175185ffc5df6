package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** Dev tool: cost of the streaming decontamination gate's two kernels as
  * the corpus (and with it the %37 benchmark slice's gram set) grows —
  * the numbers behind [[StreamOps.DecontExactGramCap]] (recorded in
  * COVERAGE.md). The exact kernel's `arrays_overlap` against a constant
  * array costs O(|bench grams|) per row (the r11 10x probe's 2.67 ->
  * 20.66 s); the Bloom kernel's per-row cost is gram-set-independent, so
  * past the gate the sweep scales with the stream alone. Both kernels
  * run on the same batch frames here (they are row-local — stream
  * machinery adds nothing to the comparison) and the Bloom keep-count is
  * printed next to the exact one, bounding the observed false-drop mass.
  * Usage: graft.dev.DecontGateProbe [sfDir] [scale10xDir] [n]
  */
object DecontGateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val bigDir = args.lift(1).getOrElse("/tmp/graft_scale10x")
    val n = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    println(f"${"dir"}%-24s ${"kernel"}%-8s kept      sec")
    Seq(sfDir, bigDir).foreach { d =>
      val docs = spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"), col("text")).localCheckpoint()
      val bench = docs.where(pmod(col("doc_id"), lit(37)) === 0)
        .localCheckpoint()
      Seq("exact" -> (Int.MaxValue - 1), "bloom" -> 0).foreach { case (label, cap) =>
        // discarded warm-up + 2 timed runs, min reported
        def run() = time(StreamOps.decontaminateStream(
          docs, bench, "text", "text", n, maxExactGrams = cap).count())
        run()
        val rs = Seq(run(), run())
        val kept = rs.head._1
        println(f"$d%-24s $label%-8s $kept%-9d ${rs.map(_._2).min}%.2f")
      }
    }

    // OVER-CAP gram-growth sweep: docs fixed (the 10x corpus), the
    // benchmark slice widened so its distinct gram set grows from ~cap
    // to far past it. The claim under test is the gate's reason to
    // exist: bloom per-row cost is gram-set-INDEPENDENT (the sweep time
    // must stay ~flat as grams grow), where the exact literal kernel is
    // O(|grams|) per row (timed at the smallest slice for reference —
    // linear extrapolation is the r11 measurement).
    {
      import graft.text.TextOps
      val docs = spark.read.parquet(s"$bigDir/documents.parquet")
        .select(col("doc_id"), col("text")).localCheckpoint()
      println(f"${"bench_mod"}%-10s ${"n_grams"}%-10s ${"kernel"}%-8s kept      sec")
      Seq(37, 13, 5).foreach { m =>
        val bench = docs.where(pmod(col("doc_id"), lit(m)) === 0)
          .localCheckpoint()
        val nGrams = bench.select(explode(TextOps.wordShingles(
            TextOps.tokens(col("text")), n)).as("g")).distinct().count()
        def run(cap: Int) = time(StreamOps.decontaminateStream(
          docs, bench, "text", "text", n, maxExactGrams = cap).count())
        run(0)
        val rs = Seq(run(0), run(0))
        println(f"$m%-10d $nGrams%-10d bloom    ${rs.head._1}%-9d ${rs.map(_._2).min}%.2f")
        if (m == 37) {
          run(Int.MaxValue - 1)
          val es = Seq(run(Int.MaxValue - 1), run(Int.MaxValue - 1))
          println(f"$m%-10d $nGrams%-10d exact    ${es.head._1}%-9d ${es.map(_._2).min}%.2f")
        }
      }
    }
    spark.stop()
  }
}
