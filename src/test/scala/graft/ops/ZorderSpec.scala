package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ZorderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // two independent uniform dimensions — the adversarial case for any
  // single-column sort
  private def grid: DataFrame = spark.range(20000).select(
    col("id").as("row_id"),
    pmod(col("id") * 2654435761L, lit(1000L)).as("x"),
    pmod(col("id") * 40503L + 7, lit(1000L)).as("y"))

  /** mean per-file (max - min) of `dim`, as a fraction of the global range */
  private def meanFileRange(path: String, dim: String): Double = {
    val byFile = spark.read.parquet(path)
      .groupBy(input_file_name()).agg(
        (max(col(dim)) - min(col(dim))).cast("double").as("r"))
      .agg(avg("r")).head.getDouble(0)
    byFile / 999.0
  }

  test("interleave places dim bits at i*nDims + d") {
    val got = spark.range(1).select(
      Zorder.interleave(Seq(lit(3L), lit(1L)), bits = 2).as("z"))
      .head.getLong(0)
    // x=0b11 (dim 0), y=0b01 (dim 1): z = x0 | y0<<1 | x1<<2 | y1<<3 = 0b0111
    assert(got == 7L)
  }

  test("cluster preserves content exactly") {
    val in = grid
    val out = Zorder.cluster(in, Seq("x", "y"), numPartitions = 16)
    assert(out.columns.toSeq == in.columns.toSeq)
    val a = in.select("row_id", "x", "y").as[(Long, Long, Long)].collect().toSet
    val b = out.select("row_id", "x", "y").as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("z-ordered files are narrow in BOTH dims; a single-column sort is not") {
    val dir = Files.createTempDirectory("graft_zorder_").toString
    Zorder.cluster(grid, Seq("x", "y"), numPartitions = 16)
      .write.mode("overwrite").parquet(s"$dir/z")
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$dir/xsort")

    val zx = meanFileRange(s"$dir/z", "x")
    val zy = meanFileRange(s"$dir/z", "y")
    // 16 z-files over 2 dims ~ 4x4 tiles: each dim range ~ 1/4 of global
    assert(zx < 0.5, s"z-order x file range too wide: $zx")
    assert(zy < 0.5, s"z-order y file range too wide: $zy")

    // the sorted-by-x baseline: x razor-sharp, y useless (~ full range)
    val sy = meanFileRange(s"$dir/xsort", "y")
    assert(sy > 0.9, s"baseline should not skip on y: $sy")
    assert(zy < sy / 2, s"z-order should at least halve y file ranges: $zy vs $sy")
  }

  test("null and constant dimensions degrade gracefully") {
    val in = spark.range(100).select(col("id"),
      when(col("id") < 50, col("id")).as("x"), lit(5L).as("c"))
    val out = Zorder.cluster(in, Seq("x", "c"), numPartitions = 2)
    assert(out.count() == 100)
  }
}
