package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Shared point-set scan pruning: predicate exactness over Long and
  * String keys at every size (incl. empty), guard-rail validation, and
  * the size gate. */
class ScanPruneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pointSetPredicate selects exactly the probed Long keys, any size") {
    val table = (0L until 5000L).map(h => h * 37L).toDF("k")
    for (n <- Seq(1, 7, 8, 9, 100, 500)) {
      val probe = (0 until n).map(i => (i * 971L) % 5000L * 37L)
        .distinct.toArray.sorted
      val got = table
        .where(ScanPrune.pointSetPredicate(probe, col("k")))
        .as[Long].collect().sorted
      assert(got.toSeq == probe.toSeq, s"n=$n")
    }
    assert(table.where(ScanPrune.pointSetPredicate(
      Array(1L, 38L, 184999L), col("k"))).count() == 0)
    assert(table.where(ScanPrune.pointSetPredicate(
      Array.empty[Long], col("k"))).count() == 0)
  }

  test("pointSetPredicate selects exactly the probed String keys (md5-hex shape)") {
    val table = (0 until 2000)
      .map(i => org.apache.commons.codec.digest.DigestUtils.md5Hex(s"doc$i"))
      .toDF("fp")
    val probe = Seq(3, 99, 1543, 7)
      .map(i => org.apache.commons.codec.digest.DigestUtils.md5Hex(s"doc$i"))
      .toArray.sorted
    val got = table.where(ScanPrune.pointSetPredicate(probe, col("fp")))
      .as[String].collect().sorted
    assert(got.toSeq == probe.toSeq)
    val misses = Array("0000", "ffff").sorted
    assert(table.where(ScanPrune.pointSetPredicate(misses, col("fp")))
      .count() == 0)
  }

  test("pointSetPredicate rejects unsorted or duplicate key arrays") {
    intercept[IllegalArgumentException] {
      ScanPrune.pointSetPredicate(Array(3L, 1L), col("k"))
    }
    intercept[IllegalArgumentException] {
      ScanPrune.pointSetPredicate(Array(1L, 1L), col("k"))
    }
  }

  test("prunedScanDf: exact under the cap, unchanged scan over it, bounded collect") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_scanprunedf_").toString + "/t"
    (0L until 5000L).map(_ * 3L).toDF("id")
      .coalesce(1).sortWithinPartitions(col("id")).write.parquet(dir)
    val scan = spark.read.parquet(dir)
    // under the cap (minTableBytes forced to 0 so the unit-test-sized
    // table passes the gate): precisely the probed keys survive
    val probe = Seq(0L, 33L, 999L, 1L, 15000L).toDF("id")
    val got = ScanPrune.prunedScanDf(spark, dir, scan, "id", probe,
      minTableBytes = 0L).as[Long].collect().sorted
    assert(got.toSeq == Seq(0L, 33L, 999L)) // 1 (not a multiple of 3) and 15000 (out of range) miss
    // over the cap: the key frame exceeds MaxPushKeys, so the scan comes
    // back unfiltered — and only cap+1 rows were ever collected
    val big = (0L until (ScanPrune.MaxPushKeys + 100L)).toDF("id")
    assert(ScanPrune.prunedScanDf(spark, dir, scan, "id", big,
      minTableBytes = 0L).count() == 5000L)
    // below the size gate nothing is collected or filtered at all
    assert(ScanPrune.prunedScanDf(spark, dir, scan, "id", probe)
      .count() == 5000L)
  }

  test("columnBytes sums one column's footer size: text dwarfs a hash column") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_colbytes_").toString + "/t"
    (0 until 500).map(i =>
        (org.apache.commons.codec.digest.DigestUtils.md5Hex(s"d$i"),
          s"document body $i " + ("lorem ipsum dolor sit amet " * 40)))
      .toDF("fp", "text").coalesce(1).write.parquet(dir)
    val fpB = ScanPrune.columnBytes(spark, dir, "fp")
    val txtB = ScanPrune.columnBytes(spark, dir, "text")
    assert(fpB > 0 && txtB > fpB,
      s"text column ($txtB) must dominate the fp column ($fpB)")
    assert(fpB + txtB <= ScanPrune.tableBytes(spark, dir))
    assert(ScanPrune.columnBytes(spark, dir, "missing") == 0L)
    assert(ScanPrune.columnBytes(spark, dir + "_absent", "fp") == 0L)
  }

  test("shouldPush gates on both key count and table size") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_scanprune_").toString + "/t"
    spark.range(10).toDF("id").write.parquet(dir)
    // tiny table: never push, regardless of key count
    assert(!ScanPrune.shouldPush(spark, dir, 10))
    assert(ScanPrune.tableBytes(spark, dir) > 0)
    assert(ScanPrune.tableBytes(spark, dir + "_missing") == 0L)
    // key-count cap applies even above the size gate (can't fake a
    // >1 GB table in a unit test; assert the pure arithmetic instead)
    assert(ScanPrune.MaxPushKeys == 2048 &&
      ScanPrune.PushMinTableBytes == (1L << 30))
  }
}
