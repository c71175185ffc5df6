package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // comma-separated query-name filter for local iteration; empty = all
    val only = sys.env.getOrElse("SPARK_GRAFT_BENCH_ONLY", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up executors/codegen so the first timed query isn't charged
    // for session initialization
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT", "300").toLong
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (k, _) => only.contains(k) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a query that throws (or times out) must NOT masquerade as a fast
      // success — record per-query ok and surface it in the JSON
      @volatile var ok = false
      val t = new Thread(() =>
        try {
          spark.sparkContext.setJobGroup(s"bench-$name", name,
            interruptOnCancel = true)
          fn(spark, sfDir).count(): Unit
          ok = true
        } catch { case _: Throwable => () })
      t.setDaemon(true)
      t.start()
      t.join(timeoutSec * 1000)
      if (t.isAlive) spark.sparkContext.cancelJobGroup(s"bench-$name")
      name -> ((System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, (v, _)) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val oks = results.map { case (k, (_, o)) => s"\"" + k + "\":" + o }
      .mkString("{", ",", "}")
    val nFailed = results.count { case (_, (_, o)) => !o }
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"ok":$oks,"n_failed":$nFailed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
