package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.vec.{VecIndex, VectorOps}

/** Dev tool: quantify ANN recall decay under distribution drift and the
  * repair [[VecIndex.refreshCentroids]] buys — the numbers behind the
  * round-12 "centroid refresh" maintenance op (recorded in COVERAGE.md).
  *
  * Scenario: an index built on clusters around one set of corners, then
  * stream-appended vectors drawn from SHIFTED clusters (the frozen
  * centroids never saw them). Probes at a fixed nprobe budget measure
  * recall@k against brute force for drifted queries:
  *  - before refresh (frozen centroids, appended mass piled wherever);
  *  - after refreshCentroids (bounded-sample re-k-means + reassign);
  *  - and, for reference, after a FULL rebalance (full-table sweeps).
  * Also prints list-size CV and wall seconds per repair, so the
  * bounded-sample claim (same recall repair, cheaper sweeps) is
  * measured, not asserted. All data is hash-deterministic — reruns
  * reproduce the table.
  *
  * The `pq` tier runs the same scenario on the IVF-PQ layout with
  * [[VecIndex.refreshCentroidsPq]] vs [[VecIndex.rebalancePq]]; ground
  * truth there is brute-force L2 (the PQ metric — these vectors are not
  * unit-norm, so cosine brute force would rank differently) and the
  * probe is the refined deployment shape.
  * Usage: graft.dev.CentroidDriftProbe [nBase] [nDrift] [dim] [k] [nprobe] [tiers]
  */
object CentroidDriftProbe {
  def main(args: Array[String]): Unit = {
    val nBase = args.lift(0).map(_.toInt).getOrElse(20000)
    val nDrift = args.lift(1).map(_.toInt).getOrElse(20000)
    val dim = args.lift(2).map(_.toInt).getOrElse(32)
    val k = args.lift(3).map(_.toInt).getOrElse(50)
    val nprobe = args.lift(4).map(_.toInt).getOrElse(1)
    val nlist = 16
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // deterministic splitmix64-style pseudo-noise from (id, dim) — full
    // 64-bit mixing so no two ids share a noise vector (no RNG: reruns
    // reproduce)
    def noise(i: Long, d: Int): Double = {
      var z = i * 0x9E3779B97F4A7C15L + d * 0xC2B2AE3D27D4EB4FL
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= (z >>> 31)
      (z & 0xFFFFFFL).toDouble / 0xFFFFFF.toDouble - 0.5
    }
    // base clusters: four well-separated corners in the FIRST half of
    // the space; the second half is flat, so every build-time centroid
    // is ~equal there. Drifted clusters carry their identity in that
    // SECOND half (eight strong signatures the frozen centroids are
    // blind to) while their first half is a pure noise tie between the
    // four corners. Assignment under frozen centroids is therefore
    // decided by noise alone — each drifted cluster SCATTERS across the
    // base lists, its true neighbors land in lists a small-nprobe probe
    // never buys, and recall decays. Refresh re-learns centroids that
    // see the second-half signatures, pulling each drifted cluster back
    // into probeable lists.
    val half = dim / 2
    def clusterBase(i: Long): Seq[Double] = {
      val c = (i % 4).toInt
      Seq.tabulate(dim)(d =>
        (if (d < half && d % 4 == c) 8.0 else 1.0) + noise(i, d))
    }
    def clusterDrift(i: Long): Seq[Double] = {
      val c = (i % 8).toInt
      Seq.tabulate(dim) { d =>
        // the first-half noise is TINY: it still decides the frozen-
        // centroid argmax (the corners tie exactly there) but
        // contributes nothing to neighbor ranking — so true neighbors
        // assign independently of the query and scatter
        if (d < half) 2.0 + 0.2 * noise(i, d)
        else (if ((d - half) % 8 == c) 8.0 else 1.0) + noise(i, d)
      }
    }
    val base = (0L until nBase).map(i => (i, clusterBase(i)))
      .toDF("vec_id", "embedding")
    val drift = (0L until nDrift).map(i => (nBase + i, clusterDrift(i)))
      .toDF("vec_id", "embedding")

    val tiers = args.lift(5).getOrElse("plain,pq").split(",").map(_.trim).toSeq
    val queries = drift.where($"vec_id" % 997 === 0).localCheckpoint()
    val all = base.unionByName(drift).localCheckpoint()
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def report(tag: String, rows: Seq[(String, Double, Double, String)]): Unit = {
      println(s"== $tag ==")
      println(f"${"stage"}%-16s ${"recall@" + k}%-10s ${"cv"}%-8s repair_s")
      rows.foreach { case (st, r, cv, t) =>
        println(f"$st%-16s $r%-10.4f $cv%-8.3f $t")
      }
    }
    def stage(drifted: DataFrame, dir: String): Unit = {
      // stream the drifted mass in via the real ingest discipline
      drifted.repartition(8).localCheckpoint().write.mode("overwrite")
        .parquet(s"$dir/__stage")
    }

    if (tiers.contains("plain")) {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_drift_probe_").toString + "/idx"
      VecIndex.build(base, dir, nlist = nlist, kmeansIters = 2)
      stage(drift, dir)
      VecIndex.append(spark.read.parquet(s"$dir/__stage"), dir)
      val exact = VectorOps.bruteForceTopK(all, queries, "vec_id", "embedding", k)
        .localCheckpoint()
      def recallNow(): Double = VectorOps.recallAtK(
        VecIndex.topK(queries, dir, k = k, nprobe = nprobe), exact)
      val cvBefore = VecIndex.listStats(spark, dir).cv
      val rBefore = recallNow()
      val ((_, afterRefresh), tRefresh) = time(
        VecIndex.refreshCentroids(spark, dir, sampleSize = 2000, kmeansIters = 2))
      val rRefresh = recallNow()
      val ((_, afterRebal), tRebal) = time(
        VecIndex.rebalance(spark, dir, kmeansIters = 2))
      val rRebal = recallNow()
      report("plain tier", Seq(
        ("drifted", rBefore, cvBefore, "-"),
        ("refresh(2k)", rRefresh, afterRefresh.cv, f"$tRefresh%.1f"),
        ("full rebalance", rRebal, afterRebal.cv, f"$tRebal%.1f")))
    }

    if (tiers.contains("pq")) {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_drift_probe_").toString + "/idxpq"
      VecIndex.buildPq(base, dir, nlist = nlist, kmeansIters = 2,
        m = 8, ksub = 64, pqIters = 2)
      stage(drift, dir)
      VecIndex.appendPq(spark.read.parquet(s"$dir/__stage"), dir)
      // exact L2 ground truth — the PQ metric; query side broadcast
      val cand = all.select($"vec_id".as("cand_id"),
          VectorOps.asDouble($"embedding").as("cand_vec"))
        .repartition($"cand_id")
      val qb = queries.select($"vec_id".as("query_id"),
        VectorOps.asDouble($"embedding").as("q_vec"))
      val wL2 = org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"dist", $"cand_id")
      val exactL2 = cand.crossJoin(broadcast(qb))
        .where($"cand_id" =!= $"query_id")
        .withColumn("dist", VectorOps.l2sq($"cand_vec", $"q_vec"))
        .withColumn("rank", row_number().over(wL2)).where($"rank" <= k)
        .select($"query_id", $"cand_id".as("neighbor_id"))
        .localCheckpoint()
      def recallPq(): Double = VectorOps.recallAtK(
        VecIndex.topKPq(queries, dir, k = k, nprobe = nprobe,
          refineWith = Some(all), refine = 4), exactL2)
      val cvBefore = VecIndex.listStats(spark, dir).cv
      val rBefore = recallPq()
      val ((_, afterRefresh), tRefresh) = time(
        VecIndex.refreshCentroidsPq(all, dir, sampleSize = 2000, kmeansIters = 2))
      val rRefresh = recallPq()
      val ((_, afterRebal), tRebal) = time(
        VecIndex.rebalancePq(all, dir, kmeansIters = 2))
      val rRebal = recallPq()
      // CODEBOOK staleness: refresh/rebalance re-learn centroids but
      // keep the codebooks FROZEN (trained on the base distribution).
      // A full rebuild over the union re-trains them too — the gap
      // between this row and "full rebalance" is the recoverable
      // recall the frozen codebooks cost under drift, and decides
      // whether a codebook-retrain repair verb is worth having.
      val rebuildDir = java.nio.file.Files
        .createTempDirectory("graft_drift_probe_").toString + "/idxpq_rebuild"
      val (_, tRebuild) = time(
        VecIndex.buildPq(all, rebuildDir, nlist = nlist, kmeansIters = 2,
          m = 8, ksub = 64, pqIters = 2))
      val rRebuild = VectorOps.recallAtK(
        VecIndex.topKPq(queries, rebuildDir, k = k, nprobe = nprobe,
          refineWith = Some(all), refine = 4), exactL2)
      report("pq tier", Seq(
        ("drifted", rBefore, cvBefore, "-"),
        ("refresh(2k)", rRefresh, afterRefresh.cv, f"$tRefresh%.1f"),
        ("full rebalance", rRebal, afterRebal.cv, f"$tRebal%.1f"),
        ("full rebuild", rRebuild, VecIndex.listStats(spark, rebuildDir).cv,
          f"$tRebuild%.1f")))
    }
    spark.stop()
  }
}
