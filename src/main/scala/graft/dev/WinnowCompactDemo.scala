package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.WinnowIndex

/** Dev tool: probe cost before/after [[WinnowIndex.compact]] on a
  * many-ingest index (file-count, not data, drives the pre-compact
  * creep). */
object WinnowCompactDemo {
  def main(args: Array[String]): Unit = {
    val nRounds = args.lift(0).map(_.toInt).getOrElse(10)
    val perStep = args.lift(1).map(_.toInt).getOrElse(10000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def docsDf(start: Long, n: Long) =
      spark.range(start, start + n).toDF("doc_id")
        .withColumn("text", concat(
          lit("unique lead section number "), col("doc_id"),
          lit(" about topic "), pmod(col("doc_id"), lit(97)),
          lit(" followed by the window footer passage "),
          lit("shared verbatim inside window number "),
          (col("doc_id") / 500).cast("long"),
          lit(" subscribe to the newsletter of this window")))
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_wcd_").toString + "/idx"
    (1 to nRounds).foreach { r =>
      val step = docsDf((r - 1).toLong * perStep, perStep).localCheckpoint()
      WinnowIndex.ingestBatch(spark, idxDir, step, "doc_id", "text")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    val batch = spark.range(0L, 100L)
      .select((col("id") + 10000000L).as("doc_id"),
        concat(lit("incoming doc "), col("id"),
          lit(" followed by the window footer passage "),
          lit("shared verbatim inside window number "), lit(0L),
          lit(" subscribe to the newsletter of this window")).as("text"))
    def probe(): Double = {
      val t0 = System.nanoTime()
      WinnowIndex.probeBatch(spark, idxDir, batch, "doc_id", "text",
        minShared = 1, maxDocsPerHash = 600).count()
      val s = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      s
    }
    def files(): Int = {
      val p = new org.apache.hadoop.fs.Path(s"$idxDir/fp")
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = f.listFiles(p, true); var n = 0
      while (it.hasNext) if (it.next().getPath.getName.startsWith("part-")) n += 1
      n
    }
    println(f"[pre-compact]  files=${files()} probes=${probe()}%.2f/${probe()}%.2f/${probe()}%.2f s")
    val t0 = System.nanoTime()
    val n = WinnowIndex.compact(spark, idxDir)
    println(f"[compact]      $n rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    println(f"[post-compact] files=${files()} probes=${probe()}%.2f/${probe()}%.2f/${probe()}%.2f s")
    spark.stop()
  }
}
