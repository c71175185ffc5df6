package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Dev tool: exact substring dedup (`TextOps.dedupSubstrings`) cost as
  * the corpus grows 10x dup-HEAVY (Synth10x: ~70% of the replicated
  * mass is byte-identical, so nearly every window in copies 1..9 is a
  * marked duplicate — the worst case for the coverage pass, not the
  * best). The claim under test: both shuffles are linear in corpus
  * tokens and survive the marked-fraction going from a few percent to
  * ~90%, i.e. the op's cost is O(tokens), never O(duplicate pairs).
  * Results recorded in COVERAGE.md. Forcing is `sum(length(text))` so
  * the rebuilt text is actually computed (a bare count would let
  * Catalyst prune the reassembly).
  * Usage: graft.dev.SubstrDedupProbe [sfDir] [scale10xDir] [minTokens]
  */
object SubstrDedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val bigDir = args.lift(1).getOrElse("/tmp/graft_scale10x")
    val l = args.lift(2).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    println(f"${"dir"}%-24s ${"op"}%-6s result                                   sec")
    Seq(sfDir, bigDir).foreach { d =>
      val docs = spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"), col("text")).localCheckpoint()
      def cut() = time(TextOps.dedupSubstrings(docs, "doc_id", "text", l)
        .agg(sum(length(col("text")))).collect()(0).getLong(0))
      def stats() = time(TextOps.substringDedupStats(docs, "doc_id", "text", l)
        .collect()(0))
      cut() // warm-up discarded
      val cs = Seq(cut(), cut())
      println(f"$d%-24s cut    out_chars=${cs.head._1}%-28d ${cs.map(_._2).min}%.2f")
      stats()
      val ss = Seq(stats(), stats())
      val r = ss.head._1
      println(f"$d%-24s stats  changed=${r.getLong(1)}/${r.getLong(0)} " +
        f"removed=${r.getLong(3)}/${r.getLong(2)} marked=${r.getLong(4)}%-8d " +
        f"${ss.map(_._2).min}%.2f")
    }
    spark.stop()
  }
}
