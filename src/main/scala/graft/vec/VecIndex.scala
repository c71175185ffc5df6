package graft.vec

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF ANN index — the vector counterpart of
  * [[graft.text.DedupIndex]]: [[VectorOps.ivfTopK]] trains centroids and
  * assigns the whole corpus on EVERY call, which is the right shape for
  * a one-shot query but wrong for a served index over a slowly-growing
  * embedding corpus. Build once, probe many:
  *
  *  - `centroids/` (centroid_id, centroid array<double>) — nlist rows,
  *    collected driver-side at probe time (tiny by construction).
  *  - `lists/` partitioned by list_id: (id, vec) — the inverted lists.
  *    A probe reads ONLY the nprobe lists its queries rank best:
  *    the probed list ids are literals by the time the scan plans, so
  *    partition pruning skips every other list on disk — the I/O shape
  *    that matters when the corpus is 100 TB and nprobe/nlist is 1/4th
  *    of it.
  *  - `params/` (nlist, dim, kmeans_iters): dimension is CHECKED at
  *    probe time — querying a 64-dim index with 128-dim vectors would
  *    otherwise fail deep inside a fold with a row-level error.
  *
  * Queries and scoring match `ivfTopK` exactly (same centroid ranking
  * projection, same cosine/tie ordering), so its measured recall table
  * (COVERAGE.md) transfers to the persisted form.
  */
object VecIndex {

  /** Train + assign + persist. Deterministic: seeds are the nlist
    * smallest ids, refinement is [[VectorOps.kmeansCentroids]] — the
    * same discipline (and therefore the same centroids) as the
    * in-memory path. */
  def build(vectors: DataFrame, indexDir: String,
            idCol: String = "vec_id", vecCol: String = "embedding",
            nlist: Int = 16, kmeansIters: Int = 2): Unit = {
    require(nlist >= 1, s"nlist must be >= 1, got $nlist")
    val spark = vectors.sparkSession
    import spark.implicits._
    val base = vectors.select(col(idCol).as("id"),
        VectorOps.asDouble(col(vecCol)).as("vec"))
      .repartition(col("id"))
      .localCheckpoint()
    val seed = base.orderBy(col("id")).limit(nlist)
      .collect()
      .map(r => r.getAs[Number](0).longValue -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).toSeq
    require(seed.nonEmpty, "VecIndex.build: empty vector table")
    val dim = seed.head._2.length
    val cents = VectorOps.kmeansCentroids(base, "vec", seed, kmeansIters)
    cents.map { case (cid, v) => (cid, v.toSeq) }
      .toDF("centroid_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/centroids")
    base.withColumn("list_id",
        element_at(VectorOps.centroidRanking(col("vec"), cents), 1))
      .write.mode("overwrite").partitionBy("list_id")
      .parquet(s"$indexDir/lists")
    Seq((nlist, dim, kmeansIters)).toDF("nlist", "dim", "kmeans_iters")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/params")
  }

  /** Append new vectors into their lists without retraining: the
    * centroids stay fixed (the IVF contract — rebuild when drift
    * matters), new rows are assigned by the same ranking projection and
    * appended to their partitions. */
  def append(vectors: DataFrame, indexDir: String,
             idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = vectors.sparkSession
    val cents = loadCentroids(spark, indexDir)
    checkDim(spark, indexDir, vectors, idCol, vecCol)
    vectors.select(col(idCol).as("id"),
        VectorOps.asDouble(col(vecCol)).as("vec"))
      .withColumn("list_id",
        element_at(VectorOps.centroidRanking(col("vec"), cents), 1))
      .write.mode("append").partitionBy("list_id")
      .parquet(s"$indexDir/lists")
  }

  private def loadCentroids(spark: SparkSession,
                            indexDir: String): Seq[(Long, Array[Double])] =
    spark.read.parquet(s"$indexDir/centroids")
      .collect()
      .map(r => r.getAs[Number](0).longValue -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).toSeq

  private def checkDim(spark: SparkSession, indexDir: String,
                       vectors: DataFrame, idCol: String, vecCol: String): Unit = {
    val dim = spark.read.parquet(s"$indexDir/params").head().getAs[Int]("dim")
    val got = vectors.select(size(col(vecCol))).head().getInt(0)
    require(got == dim,
      s"VecIndex at $indexDir holds $dim-dim vectors; got $got-dim input")
  }

  /** Top-k cosine neighbors for a query frame, probing the nprobe
    * best-ranked lists per query. Output shape matches the other
    * searchers: (query_id, rank, neighbor_id, cos). */
  def topK(queries: DataFrame, indexDir: String,
           idCol: String = "vec_id", vecCol: String = "embedding",
           k: Int = 5, nprobe: Int = 4): DataFrame = {
    val spark = queries.sparkSession
    val cents = loadCentroids(spark, indexDir)
    checkDim(spark, indexDir, queries, idCol, vecCol)
    val probes = queries
      .select(col(idCol).as("query_id"),
        VectorOps.asDouble(col(vecCol)).as("q_vec"))
      .withColumn("list_id",
        explode(slice(VectorOps.centroidRanking(col("q_vec"), cents), 1, nprobe)))
      .localCheckpoint()
    // the probed list set is a collected LITERAL by plan time, so the
    // partitioned read prunes every unprobed list directory
    val probedLists = probes.select(col("list_id")).distinct()
      .collect().map(_.getLong(0)).sorted
    val lists = spark.read.parquet(s"$indexDir/lists")
      .where(col("list_id").isin(probedLists.map(x => x: Any): _*))
    val scored = lists.join(broadcast(probes), Seq("list_id"))
      .where(col("id") =!= col("query_id"))
      .withColumn("cos", VectorOps.cosine(col("vec"), col("q_vec")))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("id").as("neighbor_id"), round(col("cos"), 4).as("cos"))
  }
}
