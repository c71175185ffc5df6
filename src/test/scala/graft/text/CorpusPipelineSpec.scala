package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("stages drop the right documents in the right order") {
    val docs = Seq(
      (1L, "the cat and the dog is in the house with the mouse"),   // clean en
      (2L, "the cat and  the dog is in the house with the mouse"),  // exact dup of 1 (ws)
      (3L, "le chat et le chien est pour la maison"),               // french -> language
      (4L, "a b"),                                                  // too short -> quality
      (5L, "spam spam spam spam spam spam spam spam is the"),       // repetitive -> quality
      (6L, "the big cat and the dog is in the house with the mouse"), // near-dup of 1
      (7L, "completely different english text that is about the weather for today"),
      (8L, "the benchmark sentence that is in the eval set for it"))
      .toDF("doc_id", "text")
    val bench = Seq("the  BENCHMARK sentence that is in the eval set for it").toDF("text")
    val (clean, audit) = CorpusPipeline.preprocess(
      docs, "doc_id", "text", benchmark = Some(bench),
      CorpusPipeline.Thresholds(nearDupThreshold = 0.4))
    val kept = clean.select("id").as[Long].collect().toSet
    // 3 language, 4+5 quality, 2 exact-dup, 6 near-dup cluster, 8 decontam
    assert(kept == Set(1L, 7L))
    val a = audit.toMap
    assert(a("input") == 8 && a("language") == 7 && a("quality") == 5)
    assert(a("exact_dedup") == 4 && a("near_dedup") == 3 && a("decontaminate") == 2)
  }

  test("decontamination catches a benchmark twin containing a URL/email") {
    // regression: the corpus text is redacted BEFORE decontamination, so
    // the benchmark side must be redacted identically or a contaminated
    // doc whose benchmark twin contains a URL/email escapes removal
    val docs = Seq(
      (1L, "visit https://eval.example.com for the benchmark answer key in the set"),
      (2L, "completely different english text that is about the weather for today"))
      .toDF("doc_id", "text")
    val bench = Seq(
      "visit https://eval.example.com for the benchmark answer key in the set")
      .toDF("text")
    val (clean, audit) = CorpusPipeline.preprocess(
      docs, "doc_id", "text", benchmark = Some(bench))
    assert(clean.select("id").as[Long].collect().toSet == Set(2L))
    assert(audit.toMap.apply("decontaminate") == 1)
  }

  test("redaction is applied to the surviving text") {
    val docs = Seq(
      (1L, "mail a.user@example.com about the cat and the dog in the house"))
      .toDF("doc_id", "text")
    val (clean, _) = CorpusPipeline.preprocess(docs, "doc_id", "text")
    assert(clean.select("text").as[String].head().contains("<EMAIL>"))
  }
}
