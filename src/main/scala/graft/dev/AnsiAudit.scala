package graft.dev
import org.apache.spark.sql.SparkSession
object AnsiAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder.master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try { fn(spark, sfDir).count(): Unit }
      catch { case e: Throwable =>
        bad += 1
        println(s"ANSI-FAIL $name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.next()}")
      }
    }
    println(s"ANSI-AUDIT done, failures=$bad")
    spark.stop()
  }
}
