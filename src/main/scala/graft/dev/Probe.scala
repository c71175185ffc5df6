package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

/** Dev-only timing/debug probe (not part of the library). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val events = StreamOps.normalize(spark.read.schema(StreamOps.eventsSchema)
      .parquet("/root/testdata/sf0.001/events.parquet"))
    val stateful = StreamOps.sessionize(events).toDF()
      .select("user_id","session_start","session_end","n_events","sum_value")
    val batch = StreamOps.sessionizeBatch(events)
    println("PROBE stateful=" + stateful.count() + " batch=" + batch.count())
    println("PROBE stateful-only:")
    stateful.exceptAll(batch).show(10, false)
    println("PROBE batch-only:")
    batch.exceptAll(stateful).show(10, false)
    spark.stop()
  }
}
