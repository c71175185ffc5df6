package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class PinsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("default pin: localCheckpoint semantics — same rows, truncated lineage, no checkpoint dir needed") {
    spark.conf.unset("spark.graft.pins.reliable")
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val pinned = Pins.pin(df)
    assert(pinned.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
    // lineage truncated: the pinned plan no longer contains the local
    // relation, it reads materialized blocks
    assert(pinned.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.getClass.getSimpleName == "LogicalRDD"))
  }

  test("spark.graft.pins.reliable=true routes through reliable checkpoint()") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pins_ck_")
    val prevDir = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(dir.toString)
    spark.conf.set("spark.graft.pins.reliable", "true")
    try {
      val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
      val pinned = Pins.pin(df)
      assert(pinned.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
      // the reliable path wrote recoverable blocks to the checkpoint dir
      def files(p: java.nio.file.Path): Long = {
        val s = java.nio.file.Files.walk(p)
        try s.filter(java.nio.file.Files.isRegularFile(_)).count()
        finally s.close()
      }
      assert(files(dir) > 0, "reliable pin must write to the checkpoint dir")
    } finally {
      spark.conf.unset("spark.graft.pins.reliable")
      prevDir.foreach(spark.sparkContext.setCheckpointDir)
    }
  }
}
