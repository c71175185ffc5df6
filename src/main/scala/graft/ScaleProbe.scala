package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time a subset of queries against an arbitrary data dir —
  * used to probe scaling behavior beyond the driver's sf0.1 (e.g. a 10x
  * documents corpus synthesized under /tmp).
  * Usage: graft.ScaleProbe <dir> [queryName ...] */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_x_dedup_pipeline", "q_x_dedup_minhash", "q_x_lang_id",
        "q_x_quality", "q_x_multimodal", "q_x_word_freq", "q_x_dedup_exact",
        "q_x_pack_sequences", "q_x_decontaminate_ngram", "q_x_lm_score",
        "q_x_repeated_passages", "q_x_dedup_incremental", "q_x_range_join")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s   rows=$n")
    }
    spark.stop()
  }
}
