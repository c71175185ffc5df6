package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle fact tables once at write time so
  * repeated equi-joins/aggregations on the bucket key run with NO
  * exchange at read time (the classic 100 TB trade: pay one shuffle at
  * ingest, amortize it over every downstream join).
  *
  * Bucketing needs a catalog table (bucket metadata lives in the
  * metastore), hence saveAsTable rather than path writes. */
object Bucketing {

  /** Write `df` as a bucketed + sorted catalog table. */
  def writeBucketed(df: DataFrame, tableName: String, key: String,
                    numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(tableName)

  /** Join two tables bucketed on the same key/count — plans without a
    * shuffle on either side. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** True if the physical plan of `df` contains no shuffle exchange. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
