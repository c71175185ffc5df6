package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ScansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("exclusivePrefixSum matches a driver-side scan regardless of layout") {
    val rows = (1L to 500L).map(i => (i, i % 13))
    val expected = rows.sortBy(_._1)
      .scanLeft((0L, 0L, 0L)) { case ((_, _, acc), (k, v)) => (k, v, acc + v) }
      .drop(1).map { case (k, v, cum) => (k, v, cum - v) }.toSet
    def run(parts: Int) =
      Scans.exclusivePrefixSum(rows.toDF("k", "v").repartition(parts), "k", "v", "pre")
        .as[(Long, Long, Long)].collect().toSet
    assert(run(1) == expected)
    assert(run(17) == expected)
  }

  test("globalRowNumber: a deterministic permutation, no single-partition stage") {
    val df = (1L to 300L).toDF("id")
      .withColumn("key", md5(col("id").cast("string")))
    val got = Scans.globalRowNumber(df.repartition(7), "key", "pos")
      .select("id", "pos").as[(Long, Long)].collect().sortBy(_._2)
    assert(got.map(_._2).toSeq == (1L to 300L))       // dense 1..n ranks
    // ranks agree with the driver-side md5 sort
    val expected = (1L to 300L)
      .sortBy(i => java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(got.map(_._1).toSeq == expected)
    val plan = Scans.globalRowNumber(df.repartition(7), "key", "pos")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }
}
