package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: what does the SQ8 index layout actually buy — on-disk
  * list bytes vs the exact (double-array) layout, probe latency at
  * matched nprobe, and recall of the compressed probe against brute
  * force. Run with SPARK_GRAFT_SF_DIR to pick the scale. */
object Sq8IndexProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    println(s"vectors: ${emb.count()}")
    def dirBytes(p: String): Long = {
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(path).getLength
    }
    def t[A](tag: String)(b: => A): A = {
      val t0 = System.nanoTime(); val r = b
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val exactDir = java.nio.file.Files.createTempDirectory("probe_idx_f64_").toString
    val sq8Dir = java.nio.file.Files.createTempDirectory("probe_idx_sq8_").toString
    t("build exact") {
      graft.vec.VecIndex.build(emb, exactDir, nlist = 16, kmeansIters = 2)
    }
    t("build sq8") {
      graft.vec.VecIndex.buildSq8(emb, sq8Dir, nlist = 16, kmeansIters = 2)
    }
    val bExact = dirBytes(s"$exactDir/lists")
    val bSq8 = dirBytes(s"$sq8Dir/lists")
    println(f"lists bytes exact=$bExact sq8=$bSq8 ratio=${bExact.toDouble / bSq8}%.2fx")
    val q = emb.where(col("vec_id") < 8)
    for (i <- 1 to 3) {
      t(s"run$i probe exact nprobe=4") {
        graft.vec.VecIndex.topK(q, exactDir, k = 5, nprobe = 4).count(): Unit
      }
      t(s"run$i probe sq8 nprobe=4") {
        graft.vec.VecIndex.topKSq8(q, sq8Dir, k = 5, nprobe = 4).count(): Unit
      }
    }
    val exact = graft.vec.VectorOps.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5)
    val sq8All = graft.vec.VecIndex.topKSq8(q, sq8Dir, k = 5, nprobe = 16)
    println(f"sq8 exhaustive recall vs brute: ${graft.vec.VectorOps.recallAtK(sq8All, exact)}%.4f")
    val sq8Part = graft.vec.VecIndex.topKSq8(q, sq8Dir, k = 5, nprobe = 4)
    println(f"sq8 nprobe=4 recall vs brute: ${graft.vec.VectorOps.recallAtK(sq8Part, exact)}%.4f")
    spark.stop()
  }
}
