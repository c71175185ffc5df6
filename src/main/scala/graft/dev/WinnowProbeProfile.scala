package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.{Winnow, WinnowIndex}

/** Throwaway: decompose WinnowIndex.probeBatch cost at two corpus
  * sizes — batch fingerprint collect, raw fp-table scan, scan+join,
  * scan+tree, full probe. */
object WinnowProbeProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def docsDf(start: Long, n: Long) =
      spark.range(start, start + n).toDF("doc_id")
        .withColumn("text", concat(
          lit("unique lead section number "), col("doc_id"),
          lit(" about topic "), pmod(col("doc_id"), lit(97)),
          lit(" followed by the window footer passage "),
          lit("shared verbatim inside window number "),
          (col("doc_id") / 500).cast("long"),
          lit(" subscribe to the newsletter of this window")))
    val batch = spark.range(0L, 100L)
      .select((col("id") + 10000000L).as("doc_id"),
        concat(lit("incoming doc "), col("id"),
          lit(" followed by the window footer passage "),
          lit("shared verbatim inside window number "), lit(0L),
          lit(" subscribe to the newsletter of this window")).as("text"))

    def t(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (rounds <- Seq(1, 5)) {
      val idxDir = java.nio.file.Files
        .createTempDirectory(s"graft_wpp_$rounds").toString + "/idx"
      (1 to rounds).foreach { r =>
        val step = docsDf((r - 1).toLong * 10000, 10000).localCheckpoint()
        WinnowIndex.ingestBatch(spark, idxDir, step, "doc_id", "text")
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
      }
      val fpT = spark.read.parquet(s"$idxDir/fp")
      println(s"== corpus=${rounds}0k: fp rows=${fpT.count()} ==")
      val bfp = Winnow.fingerprints(batch, "doc_id", "text")
        .select(col("hash"), col("doc_id").as("id")).distinct()
      val bRows = bfp.collect()
      println(f"  batch distinct (hash,id)=${bRows.length} " +
        s"distinct hashes=${bRows.map(_.getLong(0)).distinct.length}")
      println(f"  [collect bfp]      ${t(Winnow.fingerprints(batch, "doc_id", "text").select(col("hash"), col("doc_id").as("id")).distinct().collect())}%.2f s")
      println(f"  [raw scan count]   ${t(spark.read.parquet(s"$idxDir/fp").where(col("hash") > 0).count())}%.2f s")
      val hs = bRows.map(_.getLong(0)).distinct.sorted
      val hDf = hs.toSeq.toDF("h")
      println(f"  [scan+join]        ${t(spark.read.parquet(s"$idxDir/fp").join(broadcast(hDf), col("hash") === col("h")).count())}%.2f s")
      println(f"  [scan+tree]        ${t(spark.read.parquet(s"$idxDir/fp").where(WinnowIndex.hashTreePredicate(hs, col("hash"))).count())}%.2f s")
      println(f"  [full probe]       ${t(WinnowIndex.probeBatch(spark, idxDir, batch, "doc_id", "text", minShared = 1, maxDocsPerHash = 1 << 20).count())}%.2f s")
      println(f"  [full probe again] ${t(WinnowIndex.probeBatch(spark, idxDir, batch, "doc_id", "text", minShared = 1, maxDocsPerHash = 1 << 20).count())}%.2f s")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
