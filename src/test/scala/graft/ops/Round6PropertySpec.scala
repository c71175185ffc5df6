package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Property tests for the round-6 operators: randomized checks of the
  * algebraic claims (tile locality, chunk reconstruction, bloom
  * equivalence) — the cases a hand-picked fixture misses. Cases are
  * sampled in batches and evaluated through few Spark jobs, so the
  * properties stay fast despite many cases. */
class Round6PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("interleave: agreeing high bits in EVERY dim => agreeing z high bits") {
    // the Morton-curve tile property behind the file-skipping claim:
    // two points in the same 2^k x 2^k tile share all z bits above 2k
    val bits = 10
    val gen = for {
      x1 <- Gen.choose(0L, (1L << bits) - 1); y1 <- Gen.choose(0L, (1L << bits) - 1)
      x2 <- Gen.choose(0L, (1L << bits) - 1); y2 <- Gen.choose(0L, (1L << bits) - 1)
      k <- Gen.choose(1, bits)
    } yield (x1, y1, x2, y2, k)
    // evaluate the interleave expression once per batch of cases via a
    // local frame — one Spark job for all evaluations
    val cases = Gen.listOfN(200, gen).sample.get
    val df = cases.toDF("x1", "y1", "x2", "y2", "k")
    val z = (x: String, y: String) => Zorder.interleave(Seq(col(x), col(y)), bits)
    val rows = df.select(col("k"), col("x1"), col("x2"), col("y1"), col("y2"),
        z("x1", "y1").as("z1"), z("x2", "y2").as("z2"))
      .collect()
    rows.foreach { r =>
      val k = r.getInt(0)
      val sameTile = (r.getLong(1) >> k) == (r.getLong(2) >> k) &&
        (r.getLong(3) >> k) == (r.getLong(4) >> k)
      if (sameTile)
        assert((r.getLong(5) >> (2 * k)) == (r.getLong(6) >> (2 * k)),
          s"tile property violated at $r")
    }
  }

  test("chunkDocs: dropping each chunk's first `overlap` tokens (after the first) reconstructs the doc") {
    val genDoc = for {
      n <- Gen.choose(0, 60)
      ws <- Gen.listOfN(n, Gen.choose(1, 99).map(i => s"t$i"))
    } yield ws.mkString(" ")
    val genCfg = for {
      size <- Gen.choose(1, 12)
      ov <- Gen.choose(0, size - 1)
    } yield (size, ov)
    val (docs, cfgs) = (Gen.listOfN(6, genDoc).sample.get,
      Gen.listOfN(3, genCfg).sample.get)
    for ((size, ov) <- cfgs) {
      val df = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
        .toDF("doc_id", "text")
      val chunks = graft.text.TextOps.chunkDocs(df, "doc_id", "text", size, ov)
        .as[(Long, Long, String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      for ((doc, i) <- docs.zipWithIndex) {
        val want = doc.toLowerCase.trim.replaceAll("\\s+", " ")
        val cs = chunks(i.toLong).map(_._3)
        val rebuilt = (cs.head +: cs.tail.map(_.split(" ", -1).drop(ov).mkString(" ")))
          .filter(_.nonEmpty).mkString(" ")
        assert(rebuilt == want, s"reconstruction failed: size=$size ov=$ov doc='$doc'")
      }
    }
  }

  test("bloom semi/anti equal plain joins over randomized key sets") {
    val gen = for {
      bigKeys <- Gen.listOfN(120, Gen.choose(0L, 40L))
      smallKeys <- Gen.listOf(Gen.choose(0L, 40L)).map(_.take(20))
    } yield (bigKeys, smallKeys)
    val cases = Gen.listOfN(8, gen).sample.get
    for (((bigKeys, smallKeys), ci) <- cases.zipWithIndex) {
      val big = bigKeys.zipWithIndex.map { case (k, i) => (i.toLong, k) }
        .toDF("row_id", "k")
      val small = smallKeys.distinct.map(k => (k, s"v$k")).toDF("sk", "tag")
      if (small.isEmpty) {
        assert(BloomJoin.semiJoin(big, small, "k", "sk").count() == 0)
        assert(BloomJoin.antiJoin(big, small, "k", "sk").count() == bigKeys.size)
      } else {
        val semi = BloomJoin.semiJoin(big, small, "k", "sk")
          .select("row_id").as[Long].collect().toSet
        val anti = BloomJoin.antiJoin(big, small, "k", "sk")
          .select("row_id").as[Long].collect().toSet
        val member = smallKeys.toSet
        assert(semi == bigKeys.zipWithIndex.collect {
          case (k, i) if member(k) => i.toLong }.toSet, s"case $ci semi")
        assert(anti == bigKeys.zipWithIndex.collect {
          case (k, i) if !member(k) => i.toLong }.toSet, s"case $ci anti")
      }
    }
  }
}
