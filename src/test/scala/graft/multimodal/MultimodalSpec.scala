package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val media = {
    val docs = Seq((1L, "hello world of binary payloads", "s1"),
      (2L, "x", "s2")).toDF("doc_id", "text", "source")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")).cast("long"))
    Multimodal.documentsAsMedia(spark, docs)
  }

  test("feature extraction: deterministic sig, byte length, fake dims") {
    val f = Multimodal.extractFeatures(media).collect()
      .map(x => x.media_id -> x).toMap
    assert(f(1L).byte_len == 30)
    assert(f(1L).sig.length == 32) // md5 hex
    assert(f(1L).width == 16 + 30 % 64)
    // re-run is identical (stub is deterministic)
    assert(Multimodal.extractFeatures(media).collect()
      .map(x => x.media_id -> x.sig).toMap == f.view.mapValues(_.sig).toMap)
  }

  test("frame sampling + resize stubs: exact shapes, short payload safe") {
    val fr = Multimodal.sampleFrames(media, nFrames = 3, thumbW = 8, thumbH = 4)
      .collect().map(x => x.media_id -> x).toMap
    assert(fr(1L).n_frames == 3 && fr(1L).frame_sigs.length == 3)
    assert(fr(1L).thumb_len == 32) // 8*4 regardless of input size
    assert(fr(2L).n_frames == 3)   // 1-byte payload still yields frames
    assert(Multimodal.resizeStub(Array.emptyByteArray, 4, 4).length == 16)
  }
}
