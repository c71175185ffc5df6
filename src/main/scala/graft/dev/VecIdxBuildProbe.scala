package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where does q_x_ann_vecidx_pq_exhaustive's time go —
  * buildPq (kmeans + PQ train + lists write + stats refresh) vs the
  * topKPq probe? Run with SPARK_GRAFT_SF_DIR to pick the scale. */
object VecIdxBuildProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .where(col("vec_id") < 500)
    val n = emb.count().toInt
    def t[A](tag: String)(b: => A): A = {
      val t0 = System.nanoTime(); val r = b
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (i <- 1 to 3) {
      val idx = java.nio.file.Files.createTempDirectory("probe_vecidx_").toString
      t(s"run$i buildPq") {
        graft.vec.VecIndex.buildPq(emb, idx, nlist = 4, kmeansIters = 0,
          m = 8, ksub = n, pqIters = 0)
      }
      t(s"run$i topKPq") {
        graft.vec.VecIndex.topKPq(emb.where(col("vec_id") < 8), idx,
          k = 5, nprobe = 4).count(): Unit
      }
    }
    spark.stop()
  }
}
