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

  test("frame sampling: non-media payloads yield ZERO frames (a statistic, not fake bytes)") {
    val fr = Multimodal.sampleFrames(media, nFrames = 3, thumbW = 8, thumbH = 4)
      .collect().map(x => x.media_id -> x).toMap
    assert(fr(1L).n_frames == 0 && fr(1L).frame_sigs.isEmpty)
    assert(fr(1L).thumb_len == 32) // 8*4 regardless of input size
    assert(fr(2L).n_frames == 0)   // 1-byte payload: honest zero, no throw
    assert(Multimodal.resizeStub(Array.emptyByteArray, 4, 4).length == 16)
  }

  /** A REAL decodable image: gradient pixels encoded by ImageIO itself. */
  private def realImage(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 37 + y * 91) & 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, bos))
    bos.toByteArray
  }

  test("resizeImage: REAL decode+rescale+re-encode, verified by extractImageMeta round-trip") {
    // real PNG and JPEG payloads in, resized; the re-encoded thumbnail
    // must parse as a PNG of exactly the target dimensions
    for (fmt <- Seq("png", "jpg", "gif", "bmp")) {
      val src = realImage(40, 30, fmt)
      val out = Multimodal.resizeImage(src, 16, 12)
      assert(out.isDefined, s"decodable $fmt payload must resize")
      assert(Multimodal.imageMeta(out.get).contains(("png", 16, 12)),
        s"$fmt thumbnail header")
      // and it really decodes back with those dims (full pixel round-trip)
      val back = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(out.get))
      assert(back.getWidth == 16 && back.getHeight == 12)
    }
    // upscale works too (bilinear interpolation, not a crop)
    val up = Multimodal.resizeImage(realImage(8, 8, "png"), 32, 24).get
    assert(Multimodal.imageMeta(up).contains(("png", 32, 24)))
    // the header-only fakePng has no real pixel data: honest None
    assert(Multimodal.resizeImage(
      Multimodal.fakePng(10, 10, "junk".getBytes), 4, 4).isEmpty)
    // opaque bytes / empty payloads: None, never a throw
    assert(Multimodal.resizeImage("not an image".getBytes, 4, 4).isEmpty)
    assert(Multimodal.resizeImage(Array.emptyByteArray, 4, 4).isEmpty)
  }

  test("resizeImages: batched real resize — image rows get thumbnails, opaque rows nulls") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, realImage(24, 18, "png"), "image/png", "s"),
      Multimodal.MediaRow(2L, realImage(60, 40, "jpg"), "image/jpeg", "s"),
      Multimodal.MediaRow(3L, "plain text payload".getBytes, "text/plain", "s"))
    val got = Multimodal.resizeImages(rows.toDS(), 8, 8).collect()
      .map(t => t.media_id -> t).toMap
    assert(got(1L).width == 8 && got(1L).height == 8)
    assert(Multimodal.imageMeta(got(1L).thumb).contains(("png", 8, 8)))
    assert(Multimodal.imageMeta(got(2L).thumb).contains(("png", 8, 8)))
    assert(got(3L).thumb == null && got(3L).width == null)
    // deterministic across runs (same pixels in, same PNG bytes out)
    val again = Multimodal.resizeImages(rows.toDS(), 8, 8).collect()
      .map(t => t.media_id -> t).toMap
    assert(java.util.Arrays.equals(got(1L).thumb, again(1L).thumb))
  }

  test("sampleFrames uses the REAL resize for image payloads") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, realImage(40, 30, "png"), "image/png", "s"))
    val fr = Multimodal.sampleFrames(rows.toDS(), nFrames = 2,
      thumbW = 8, thumbH = 4).collect().head
    // a real PNG thumbnail is a full container, not the stub's w*h bytes
    assert(fr.thumb_len != 32)
    assert(fr.thumb_len ==
      Multimodal.resizeImage(realImage(40, 30, "png"), 8, 4).get.length)
  }

  test("gifFrames: REAL animated-GIF decode — even sampling, PNG frames, honest None") {
    val gif = Multimodal.makeAnimatedGif(10, 8,
      Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffff00, 0x00ffff))
    assert(Multimodal.imageMeta(gif).contains(("gif", 10, 8)))
    // ask for fewer frames than stored: first and last always included
    val three = Multimodal.gifFrames(gif, 3).get
    assert(three.length == 3)
    three.foreach { png =>
      assert(Multimodal.imageMeta(png).contains(("png", 10, 8)))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img.getWidth == 10 && img.getHeight == 8)
    }
    def corner(png: Array[Byte]): Int =
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
        .getRGB(0, 0) & 0xffffff
    // GIF's 256-color quantization may shift hues; frames must still be
    // the 1st, 3rd and 5th DISTINCT colors in order
    assert(corner(three(0)) != corner(three(1)))
    assert(corner(three(1)) != corner(three(2)))
    // ask for more frames than stored: each stored frame once, no repeats
    assert(Multimodal.gifFrames(gif, 9).get.length == 5)
    // a still GIF is a 1-frame animation
    assert(Multimodal.gifFrames(realImage(6, 6, "gif"), 4).get.length == 1)
    // non-GIF and corrupt payloads: None, never a throw
    assert(Multimodal.gifFrames(realImage(6, 6, "png"), 2).isEmpty)
    assert(Multimodal.gifFrames("GIF89a then garbage".getBytes, 2).isEmpty)
    assert(Multimodal.gifFrames(Array.emptyByteArray, 2).isEmpty)
  }

  test("sampleFrames: REAL frames for animated GIFs and MP4s, zero for opaque bytes") {
    import spark.implicits._
    val gif = Multimodal.makeAnimatedGif(12, 12, Seq(0x111111, 0xeeeeee, 0x808080))
    val mp4 = Multimodal.fakeMp4WithSamples(
      sampleSizes = Seq(10, 20, 30, 40), syncSamples = Seq(1, 3))
    val rows = Seq(
      Multimodal.MediaRow(1L, gif, "image/gif", "s"),
      Multimodal.MediaRow(2L, "opaque video-ish bytes".getBytes, "video/mp4", "s"),
      Multimodal.MediaRow(3L, mp4, "video/mp4", "s"))
    val got = Multimodal.sampleFrames(rows.toDS(), nFrames = 8,
      thumbW = 4, thumbH = 4).collect().map(x => x.media_id -> x).toMap
    // the GIF yields its 3 real frames (not 8), distinct sigs
    assert(got(1L).n_frames == 3)
    assert(got(1L).frame_sigs.distinct.length == 3)
    // and its thumbnail is the real resize (a PNG container, not 16 bytes)
    assert(got(1L).thumb_len != 16)
    // bytes with no parseable container yield zero frames
    assert(got(2L).n_frames == 0)
    // the MP4 yields its 2 SYNC samples, distinct content
    assert(got(3L).n_frames == 2)
    assert(got(3L).frame_sigs.distinct.length == 2)
  }

  test("mp4SampleTable: stsc/stsz/stco/stss combine into exact byte ranges") {
    // 5 samples, 2 per chunk -> chunks (1,2)(3,4)(5); syncs 1,4,5
    val sizes = Seq(7, 11, 13, 17, 19)
    val p = Multimodal.fakeMp4WithSamples(sizes, Seq(1, 4, 5))
    val table = Multimodal.mp4SampleTable(p).get
    assert(table.map(_.sample) == Seq(1, 2, 3, 4, 5))
    assert(table.map(_.size) == sizes.map(_.toLong))
    assert(table.map(_.sync) == Seq(true, false, false, true, true))
    // offsets: contiguous within a chunk, chunk starts re-anchor at stco
    assert(table(1).offset == table(0).offset + 7)   // same chunk
    assert(table(3).offset == table(2).offset + 13)  // same chunk
    // sample content proves the offsets land where the muxer wrote them
    table.foreach { s =>
      val bytes = p.slice(s.offset.toInt, (s.offset + s.size).toInt)
      assert(bytes.length == s.size.toInt && bytes.forall(_ == s.sample.toByte),
        s"sample ${s.sample} bytes")
    }
    // and the header-metadata walk still reads the same file
    assert(Multimodal.videoMeta(p).exists(_._1 == "isom"))
  }

  test("mp4Frames: evenly-spaced sync samples, honest None on junk") {
    val p = Multimodal.fakeMp4WithSamples(
      sampleSizes = (1 to 9).map(_ * 3), syncSamples = Seq(1, 3, 5, 7, 9))
    // ask for 3 of 5 syncs: first, middle, last
    val three = Multimodal.mp4Frames(p, 3).get
    assert(three.map(_.head) == Seq(1.toByte, 5.toByte, 9.toByte))
    // ask for more than stored: each sync once
    assert(Multimodal.mp4Frames(p, 99).get.length == 5)
    // no stss -> every sample is a sync sample
    val allSync = Multimodal.fakeMp4WithSamples(Seq(4, 4), Seq(1, 2))
    assert(Multimodal.mp4Frames(allSync, 9).get.length == 2)
    // a TRUNCATED file drops out-of-bounds ranges instead of clamping
    val trunc = p.take(p.length - 20)
    val got = Multimodal.mp4Frames(trunc, 9)
    assert(got.forall(_.forall(f => f.nonEmpty)))
    // junk and the headers-only fakeMp4 (no stbl): None, never a throw
    assert(Multimodal.mp4Frames("not an mp4".getBytes, 2).isEmpty)
    assert(Multimodal.mp4Frames(Multimodal.fakeMp4(1000, 5000), 2).isEmpty)
    assert(Multimodal.mp4Frames(Array.emptyByteArray, 2).isEmpty)
  }

  test("imageMeta: real header parse for PNG/GIF/BMP/JPEG, None for opaque bytes") {
    // PNG via our own container writer (round-trips by construction)
    assert(Multimodal.imageMeta(Multimodal.fakePng(640, 480, Array[Byte](1, 2)))
      .contains(("png", 640, 480)))
    // GIF89a, 320x200 little-endian
    val gif = "GIF89a".getBytes ++ Array[Byte](0x40, 0x01, 0xc8.toByte, 0x00, 0, 0, 0, 0)
    assert(Multimodal.imageMeta(gif).contains(("gif", 320, 200)))
    // BMP: 'BM' + header; width 100 at offset 18, height -50 (top-down) at 22
    val bmp = new Array[Byte](26)
    bmp(0) = 'B'; bmp(1) = 'M'; bmp(18) = 100
    bmp(22) = (-50 & 0xff).toByte; bmp(23) = 0xff.toByte; bmp(24) = 0xff.toByte; bmp(25) = 0xff.toByte
    assert(Multimodal.imageMeta(bmp).contains(("bmp", 100, 50)))
    // JPEG: SOI, APP0 segment (skipped), SOF0 with height 77 width 33
    val jpeg = Array[Int](0xff, 0xd8, 0xff, 0xe0, 0x00, 0x04, 0x4a, 0x46,
      0xff, 0xc0, 0x00, 0x0b, 8, 0, 77, 0, 33, 3, 0, 0, 0).map(_.toByte)
    assert(Multimodal.imageMeta(jpeg).contains(("jpeg", 33, 77)))
    // opaque bytes -> None, never a throw (also: too-short payloads)
    assert(Multimodal.imageMeta("not an image at all".getBytes).isEmpty)
    assert(Multimodal.imageMeta(Array.emptyByteArray).isEmpty)
    assert(Multimodal.imageMeta(Array[Byte](0xff.toByte, 0xd8.toByte, 0x00)).isEmpty)
  }

  test("extractImageMeta: recognized rows carry dims, opaque rows carry nulls") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, Multimodal.fakePng(8, 9, "x".getBytes), "image/png", "s"),
      Multimodal.MediaRow(2L, "plain text".getBytes, "text/plain", "s"))
    val got = Multimodal.extractImageMeta(rows.toDS()).collect()
      .map(m => m.media_id -> m).toMap
    assert(got(1L).format == "png" && got(1L).width == 8 && got(1L).height == 9)
    assert(got(2L).format == null && got(2L).width == null)
  }

  test("audioMeta: real WAV header parse — shape, duration math, chunk walk, opaque-safe") {
    // 2ch 16-bit 16kHz, 64000 data bytes -> byteRate 64000 -> 1000 ms
    val wav = Multimodal.fakeWav(2, 16000, 16, 64000)
    assert(Multimodal.audioMeta(wav).contains(("pcm", 2, 16000, 1000L)))
    // duration floors: 1ch 8-bit 8kHz, 12345 bytes -> 12345*1000/8000 = 1543 ms
    assert(Multimodal.audioMeta(Multimodal.fakeWav(1, 8000, 8, 12345))
      .contains(("pcm", 1, 8000, 1543L)))
    // an extra LIST chunk between WAVE and fmt must be walked over
    val base = Multimodal.fakeWav(1, 44100, 16, 100)
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ "INFOab".getBytes("US-ASCII")
    val shuffled = base.slice(0, 12) ++ listChunk ++ base.slice(12, base.length)
    // RIFF size field is stale after the splice; the parser only walks chunks
    assert(Multimodal.audioMeta(shuffled).contains(("pcm", 1, 44100, 100 * 1000L / 88200)))
    // declared data size counts even when payload bytes are truncated
    assert(Multimodal.audioMeta(Multimodal.fakeWav(1, 8000, 16, 4000).take(44))
      .contains(("pcm", 1, 8000, 250L)))
    // opaque / short / non-RIFF payloads -> None, never a throw
    assert(Multimodal.audioMeta("definitely not audio".getBytes).isEmpty)
    assert(Multimodal.audioMeta(Array.emptyByteArray).isEmpty)
    assert(Multimodal.audioMeta("RIFF1234AVI ".getBytes).isEmpty)
  }

  test("extractAudioMeta: recognized rows carry shape, opaque rows carry nulls") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, Multimodal.fakeWav(2, 22050, 16, 882), "audio/wav", "s"),
      Multimodal.MediaRow(2L, "plain text".getBytes, "text/plain", "s"))
    val got = Multimodal.extractAudioMeta(rows.toDS()).collect()
      .map(m => m.media_id -> m).toMap
    assert(got(1L).codec == "pcm" && got(1L).channels == 2 &&
      got(1L).sample_rate == 22050 && got(1L).duration_ms == 882L * 1000 / 88200)
    assert(got(2L).codec == null && got(2L).channels == null)
  }

  test("videoMeta: real MP4 box walk — brand, timescale, duration math, opaque-safe") {
    // 90 s at timescale 600 -> 54000 ticks
    val mp4 = Multimodal.fakeMp4(600, 54000, "mp41")
    assert(Multimodal.videoMeta(mp4).contains(("mp41", 600, 90000L)))
    // non-integer seconds floor at the ms: 1001 ticks at 600 -> 1668 ms
    assert(Multimodal.videoMeta(Multimodal.fakeMp4(600, 1001))
      .contains(("isom", 600, 1001L * 1000 / 600)))
    // opaque bytes and truncated/garbage boxes return None
    assert(Multimodal.videoMeta("plain text here".getBytes).isEmpty)
    assert(Multimodal.videoMeta(Array[Byte](0, 0, 0, 2, 'f', 't')).isEmpty)
    // ftyp alone (no moov/mvhd) is not enough
    val ftypOnly = java.util.Arrays.copyOfRange(mp4, 0, 20)
    assert(Multimodal.videoMeta(ftypOnly).isEmpty)
  }

  test("extractVideoMeta: recognized rows carry duration, opaque rows carry nulls") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, Multimodal.fakeMp4(1200, 36000), "video/mp4", "s"),
      Multimodal.MediaRow(2L, "not a video".getBytes, "text/plain", "s"))
    val got = Multimodal.extractVideoMeta(rows.toDS()).collect()
      .map(m => m.media_id -> m).toMap
    assert(got(1L).brand == "isom" && got(1L).timescale == 1200 &&
      got(1L).duration_ms == 30000L)
    assert(got(2L).brand == null && got(2L).timescale == null)
  }
}
