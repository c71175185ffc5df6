package graft.dev

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

object InPushdownProbe {
  def hashTree(sorted: Array[Long], c: Column, leaf: Int = 8): Column = {
    def build(lo: Int, hi: Int): Column =
      if (hi - lo <= leaf)
        c.isin(sorted.slice(lo, hi).map(java.lang.Long.valueOf): _*)
      else {
        val mid = (lo + hi) >>> 1
        (c >= sorted(lo)) && (c <= sorted(hi - 1)) &&
          (build(lo, mid) || build(mid, hi))
      }
    if (sorted.isEmpty) lit(false) else build(0, sorted.length)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("in-pushdown-probe")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    import spark.implicits._
    val dir = "/tmp/expt/sorted_fp2"
    val n = 20000000L
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    for (b <- Seq(2000, 2048, 3000)) {
      val probes = (0 until b).map(i =>
        java.lang.Long.valueOf(math.abs((i * 2654435761L + 12345) % n)))
      val hits = spark.read.parquet(dir)
        .where(col("id").isin(probes: _*)).select("hash")
        .as[Long].collect().sorted
      val hitsDf = hits.toSeq.toDF("h")
      // tree + join (the proposed probe shape)
      val (c1, t1) = timed {
        spark.read.parquet(dir).where(hashTree(hits, col("hash")))
          .join(broadcast(hitsDf), col("hash") === col("h")).count()
      }
      // join only (current probe shape)
      val (c2, t2) = timed {
        spark.read.parquet(dir)
          .join(broadcast(hitsDf), col("hash") === col("h")).count()
      }
      println(f"[b=$b] tree+join=$c1 ${t1}%.2fs | join-only=$c2 ${t2}%.2fs")
    }
    spark.stop()
  }
}
