package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val t = new Thread(() =>
        try {
          spark.sparkContext.setJobGroup(s"bench-$name", name,
            interruptOnCancel = true)
          fn(spark, sfDir).count(): Unit
        } catch { case _: Throwable => () })
      t.setDaemon(true)
      t.start()
      t.join(timeoutSec * 1000)
      if (t.isAlive) spark.sparkContext.cancelJobGroup(s"bench-$name")
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
