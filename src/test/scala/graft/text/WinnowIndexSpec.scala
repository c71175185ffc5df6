package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Persisted winnow index: probe == the scan-form overlap on the same
  * corpus, incremental ingest, replay absorption, param pinning,
  * boilerplate cap. */
class WinnowIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp() = java.nio.file.Files
    .createTempDirectory("graft_winnow_idx_").toString + "/idx"

  private val boiler = "subscribe to our newsletter for updates every week"
  private def corpusDocs = Seq(
    (1L, s"the quick brown fox jumped over the lazy dog $boiler"),
    (2L, s"an entirely different body of prose about mountains $boiler"),
    (3L, "nothing shared here at all kumquat zephyr veldt fjord"))
    .toDF("doc_id", "text")

  test("probe matches the scan-form overlap on the same corpus") {
    val dir = tmp()
    assert(WinnowIndex.ingestBatch(spark, dir, corpusDocs,
      "doc_id", "text") == 3)
    // batch doc 10 shares the boilerplate passage with docs 1 and 2
    val batch = Seq((10L, s"fresh arrival with its own text $boiler"))
      .toDF("doc_id", "text")
    val viaIdx = WinnowIndex.probeBatch(spark, dir, batch,
        "doc_id", "text", minShared = 2, maxDocsPerHash = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // scan form on corpus + batch, restricted to pairs touching doc 10
    val scan = Winnow.overlap(corpusDocs.union(batch), "doc_id", "text",
        minShared = 2, maxDocsPerHash = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val scanTouching10 = scan.collect {
      case ((a, b), n) if b == 10L => (10L, a) -> n
      case ((a, b), n) if a == 10L => (10L, b) -> n
    }.toMap
    assert(viaIdx == scanTouching10 && viaIdx.nonEmpty)
    assert(viaIdx.keySet == Set((10L, 1L), (10L, 2L)))
  }

  test("ingest is incremental and replays are absorbed") {
    val dir = tmp()
    assert(WinnowIndex.ingestBatch(spark, dir,
      corpusDocs.where($"doc_id" <= 2), "doc_id", "text") == 2)
    assert(WinnowIndex.ingestBatch(spark, dir,
      corpusDocs, "doc_id", "text") == 1)  // only doc 3 is new
    assert(WinnowIndex.ingestBatch(spark, dir,
      corpusDocs, "doc_id", "text") == 0)  // full replay: nothing
    val batch = Seq((10L, s"padding words here $boiler"))
      .toDF("doc_id", "text")
    val pairs = WinnowIndex.probeBatch(spark, dir, batch, "doc_id", "text")
      .collect().map(_.getLong(1)).toSet
    assert(pairs == Set(1L, 2L)) // each corpus doc indexed exactly once
  }

  test("probing with different winnowing params throws") {
    val dir = tmp()
    WinnowIndex.ingestBatch(spark, dir, corpusDocs, "doc_id", "text",
      WinnowIndex.Params(k = 8, w = 4))
    val e = intercept[IllegalArgumentException] {
      WinnowIndex.probeBatch(spark, dir, corpusDocs, "doc_id", "text",
        WinnowIndex.Params(k = 5, w = 4))
    }
    assert(e.getMessage.contains("was built with"))
  }

  test("the per-hash doc cap drops corpus-wide boilerplate") {
    val dir = tmp()
    // 6 corpus docs all sharing the boilerplate
    val many = (1L to 6L).map(i => (i, s"unique lead $i $boiler"))
      .toDF("doc_id", "text")
    WinnowIndex.ingestBatch(spark, dir, many, "doc_id", "text")
    val batch = Seq((10L, s"incoming with $boiler")).toDF("doc_id", "text")
    val capped = WinnowIndex.probeBatch(spark, dir, batch, "doc_id", "text",
      minShared = 1, maxDocsPerHash = 2)
    assert(capped.count() == 0)
    val uncapped = WinnowIndex.probeBatch(spark, dir, batch, "doc_id", "text",
      minShared = 1, maxDocsPerHash = 50)
    assert(uncapped.count() == 6)
  }

  test("probe on an empty index returns an empty typed frame") {
    val dir = tmp()
    val out = WinnowIndex.probeBatch(spark, dir,
      corpusDocs, "doc_id", "text")
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("batch_id", "corpus_id", "n_shared"))
  }
}
