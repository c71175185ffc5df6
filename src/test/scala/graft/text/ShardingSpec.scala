package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Shard manifest: assignment determinism, manifest consistency, and
  * the tamper-evidence contract (changed / removed / duplicated docs
  * flip exactly their shard's line). */
class ShardingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = (1L to 60L).map(i => (i, s"document body $i text"))
    .toDF("doc_id", "text")

  test("assignment is deterministic, layout-invariant and in range") {
    val a = Sharding.assign(docs, "doc_id", 4)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val b = Sharding.assign(docs.repartition(7), "doc_id", 4)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(a == b)
    assert(a.values.forall(s => s >= 0 && s < 4))
    assert(a.values.toSet.size > 1) // md5 spread, not all one shard
  }

  test("manifest totals are consistent with the assignment") {
    val m = Sharding.audit(docs, "doc_id", "text", 4).collect()
    assert(m.map(_.getLong(1)).sum == 60)     // n_docs
    assert(m.map(_.getLong(2)).sum == 60 * 4) // 4 tokens per doc
    val asg = Sharding.assign(docs, "doc_id", 4)
      .groupBy("shard").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    m.foreach(r => assert(asg(r.getInt(0)) == r.getLong(1)))
  }

  test("tamper evidence: a changed doc flips exactly its shard's hash") {
    val base = Sharding.audit(docs, "doc_id", "text", 4)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    import org.apache.spark.sql.functions._
    val tampered = docs.withColumn("text",
      when(col("doc_id") === 17L, lit("tampered")).otherwise(col("text")))
    val after = Sharding.audit(tampered, "doc_id", "text", 4)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    val hitShard = Sharding.assign(docs, "doc_id", 4)
      .where(col("doc_id") === 17L).select("shard").as[Int].head()
    assert(base.keySet == after.keySet)
    base.keySet.foreach { s =>
      if (s == hitShard) assert(base(s) != after(s), s"shard $s must flip")
      else assert(base(s) == after(s), s"shard $s must not flip")
    }
  }

  test("auditDiff reconciles shipped vs recomputed manifests per shard") {
    import org.apache.spark.sql.functions._
    val shipped = Sharding.audit(docs, "doc_id", "text", 4)
    // received copy: doc 17 tampered, plus doc 5 duplicated twice
    // (even count: XOR cancels -> count_mismatch, not hash_mismatch)
    val received = docs
      .withColumn("text",
        when(col("doc_id") === 17L, lit("tampered")).otherwise(col("text")))
      .union(docs.where(col("doc_id") === 5L))
      .union(docs.where(col("doc_id") === 5L))
    val got = Sharding.auditDiff(shipped,
        Sharding.audit(received, "doc_id", "text", 4))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val s17 = Sharding.assign(docs, "doc_id", 4)
      .where(col("doc_id") === 17L).select("shard").as[Int].head()
    val s5 = Sharding.assign(docs, "doc_id", 4)
      .where(col("doc_id") === 5L).select("shard").as[Int].head()
    assert(got(s17) == "hash_mismatch")
    // hash beats count when both hit one shard (md5 spread: distinct here)
    assert(got(s5) == (if (s5 == s17) "hash_mismatch" else "count_mismatch"))
    got.foreach { case (s, v) =>
      if (s != s17 && s != s5) assert(v == "ok", s"shard $s: $v") }
    // a whole missing shard
    val partial = Sharding.audit(docs, "doc_id", "text", 4)
      .where(col("shard") =!= s17)
    val withMissing = Sharding.auditDiff(shipped, partial)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(withMissing(s17) == "missing")
  }

  test("tamper evidence: a dropped doc flips the hash; an even duplicate is caught by n_docs") {
    import org.apache.spark.sql.functions._
    val base = Sharding.audit(docs, "doc_id", "text", 2).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(3))).toMap
    val dropped = Sharding.audit(docs.where(col("doc_id") =!= 5L),
      "doc_id", "text", 2).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(3))).toMap
    val s5 = Sharding.assign(docs, "doc_id", 2)
      .where(col("doc_id") === 5L).select("shard").as[Int].head()
    assert(dropped(s5)._2 != base(s5)._2 && dropped(s5)._1 == base(s5)._1 - 1)
    // doc duplicated twice more (even count): XOR cancels, count doesn't
    val dup = docs.union(docs.where(col("doc_id") === 5L))
      .union(docs.where(col("doc_id") === 5L))
    val duped = Sharding.audit(dup, "doc_id", "text", 2).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(duped(s5)._2 == base(s5)._2 && duped(s5)._1 == base(s5)._1 + 2)
  }
}
