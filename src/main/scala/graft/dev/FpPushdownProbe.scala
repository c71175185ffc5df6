package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.ScanPrune

/** Dev tool: evidence that the ScanPrune point-set pushdown fires on a
  * GATE-SIZED (>= 1 GB) md5-string fp table — the DedupIndex exact-dup
  * probe shape. Builds an fp-sorted fine-paged table of `nRows` md5
  * strings, then compares a batch-sized anti-join with and without the
  * pushed predicate: wall time and scan output rows. */
object FpPushdownProbe {
  def main(args: Array[String]): Unit = {
    val nRows = args.lift(0).map(_.toLong).getOrElse(30000000L)
    val nProbe = args.lift(1).map(_.toInt).getOrElse(1000)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_fp_push_").toString + "/fp"
    spark.range(nRows)
      .select(md5(col("id").cast("string")).as("fp"), col("id"))
      .repartitionByRange(16, col("fp"))
      .sortWithinPartitions("fp")
      .write.mode("overwrite")
      .option("parquet.page.row.count.limit", ScanPrune.PageRowLimit)
      .parquet(dir)
    val gb = ScanPrune.tableBytes(spark, dir) / 1e9
    println(f"[table] $nRows rows, $gb%.2f GB, gate=${gb * 1e9 >= ScanPrune.PushMinTableBytes}")
    // probe batch: half hits, half misses
    val probe = ((0 until nProbe / 2).map(i =>
        org.apache.commons.codec.digest.DigestUtils.md5Hex(
          ((i * 104729L) % nRows).toString)) ++
      (0 until nProbe / 2).map(i => s"zzz_miss_$i"))
      .distinct.toArray.sorted
    val probeDf = probe.toSeq.toDF("pfp")
    // without pushdown: plain scan (the pre-round-11 shape)
    val t0 = System.nanoTime()
    val plain = probeDf.join(spark.read.parquet(dir).select("fp"),
      col("pfp") === col("fp"), "left_anti").count()
    println(f"[plain]  survivors=$plain time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    // with pushdown (what probeWithSigs does above the gate)
    val t1 = System.nanoTime()
    val pushed = probeDf.join(
      spark.read.parquet(dir).select("fp")
        .where(ScanPrune.pointSetPredicate(probe, col("fp"))),
      col("pfp") === col("fp"), "left_anti").count()
    println(f"[pushed] survivors=$pushed time=${(System.nanoTime() - t1) / 1e9}%.2f s")
    assert(plain == pushed, s"pushdown changed the anti-join: $plain vs $pushed")
    spark.stop()
  }
}
