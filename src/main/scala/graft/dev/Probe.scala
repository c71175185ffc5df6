package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only timing probe for pipeline stages (not part of the library). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("gate query cold") {
      val (groups, pairs) = graft.text.TextOps.nearDupPipeline(
        docs, "doc_id", "text", 3, 64, 16, 0.5)
      groups.agg(count(lit(1)).as("n"), sum(col("n_copies")).as("d"))
        .crossJoin(pairs.agg(count(lit(1)).as("p"))).count()
    }
    time("gate query warm") {
      val (groups, pairs) = graft.text.TextOps.nearDupPipeline(
        docs, "doc_id", "text", 3, 64, 16, 0.5)
      groups.agg(count(lit(1)).as("n"), sum(col("n_copies")).as("d"))
        .crossJoin(pairs.agg(count(lit(1)).as("p"))).count()
    }
    spark.stop()
  }
}
