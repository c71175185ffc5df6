package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("join of co-bucketed tables plans without a shuffle") {
    val facts = (1 to 1000).map(i => (i.toLong % 50, s"f$i", i * 1.0))
      .toDF("key", "tag", "v")
    val dims = (0 to 49).map(i => (i.toLong, s"dim$i")).toDF("key", "name")
    Bucketing.writeBucketed(facts, "b_facts", "key", 8)
    Bucketing.writeBucketed(dims, "b_dims", "key", 8)

    // disable broadcast so the comparison is sort-merge vs sort-merge —
    // otherwise tiny sides go broadcast and the join never exercises the
    // bucket layout at all
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_facts", "b_dims", "key")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(Bucketing.isShuffleFree(joined), plan.take(800))
      assert(plan.contains("Bucketed: true"), plan.take(800))

      // the same join on plain (non-bucketed) frames DOES shuffle
      val plain = facts.join(dims, "key")
      plain.count()
      assert(!Bucketing.isShuffleFree(plain))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucket-key aggregation over a bucketed table avoids the exchange") {
    val agg = spark.table("b_facts").groupBy("key")
      .agg(org.apache.spark.sql.functions.sum("v"))
    agg.count()
    assert(Bucketing.isShuffleFree(agg))
  }
}
