package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §7.5): media as opaque binary
  * payloads with typed metadata, decoded/feature-extracted in batched
  * per-partition passes.
  *
  * What is REAL vs STUBBED: container-header metadata (PNG/JPEG/GIF/BMP,
  * WAV, MP4) is parsed for real from the leading bytes; still-image
  * PIXEL decode + resize is real too, via the JDK's built-in
  * `javax.imageio` ([[resizeImage]]/[[resizeImages]] — no external codec
  * jars needed for PNG/JPEG/GIF/BMP), as is multi-frame sampling from
  * ANIMATED GIFs ([[gifFrames]]) and keyframe EXTRACTION from MP4s
  * ([[mp4Frames]] — the `stbl` sample-table walk yields real stored
  * frame bytes; only the codec DECODE of those bytes is out of scope,
  * since no video codec ships in the JDK). [[decodeStub]] remains for
  * payloads that are not media at all (the driver's text-as-media
  * stand-in).
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata, the storage shape for
    * image/audio/video columns at scale. */
  final case class MediaRow(media_id: Long, payload: Array[Byte],
                            media_type: String, source: String)

  /** Extracted features (what a decoder would emit). */
  final case class MediaFeatures(media_id: Long, byte_len: Long,
                                 sig: String, width: Int, height: Int)

  /** STUB decoder: a real implementation would decode the payload
    * (image/audio frame) here. The fake is deterministic — md5 signature
    * plus dimensions derived from the byte length — so tests and oracle
    * checks are stable. */
  def decodeStub(payload: Array[Byte]): (String, Int, Int) = {
    val md = MessageDigest.getInstance("MD5")
    val sig = md.digest(payload).map("%02x".format(_)).mkString
    val w = 16 + (payload.length % 64)
    val h = 16 + ((payload.length / 64) % 64)
    (sig, w, h)
  }

  /** Batched per-partition feature extraction. mapPartitions (not a
    * per-row UDF) so a real decoder can amortize codec init per batch —
    * the Spark-side analogue of mapInPandas batch shape. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens HERE (codec handles, model weights...)
      rows.map { r =>
        val (sig, w, h) = decodeStub(r.payload)
        MediaFeatures(r.media_id, r.payload.length.toLong, sig, w, h)
      }
    }
  }

  /** REAL image resize via the JDK's built-in ImageIO — decodes
    * PNG/JPEG/GIF/BMP payloads, rescales with bilinear interpolation
    * through `Graphics2D`, re-encodes PNG. No external codec jars.
    * Returns None for payloads no installed reader decodes (including
    * the header-only [[fakePng]] synthetics, whose IDAT tail is not a
    * real zlib stream — a decode failure is the honest outcome there).
    * Call from a mapPartitions pass ([[resizeImages]]) so codec
    * initialization amortizes per batch; the in-memory stream keeps
    * ImageIO's disk cache out of the executor hot path. */
  def resizeImage(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    require(w > 0 && h > 0, s"resizeImage: target must be positive, got ${w}x$h")
    try {
      val in = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val img = javax.imageio.ImageIO.read(in)
      if (img == null) None
      else {
        val out = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_ARGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null): Unit
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case _: Exception => None } // truncated/corrupt payload
  }

  /** The resized-thumbnail row: null payload when the bytes did not
    * decode as an image (the honest outcome, mirroring [[MediaMeta]]). */
  final case class MediaThumb(media_id: Long, thumb: Array[Byte],
                              width: Integer, height: Integer)

  /** Batched REAL image resize over a media column — the mapPartitions
    * shape of [[extractFeatures]] with `javax.imageio` doing the pixel
    * work; at 100 TB this is a pure per-row CPU map, no shuffle, and the
    * PNG thumbnails it emits are ~w*h*4 bytes before compression, so the
    * output column is bounded regardless of input image sizes. */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaThumb] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        resizeImage(r.payload, w, h) match {
          case Some(png) => MediaThumb(r.media_id, png, w, h)
          case None      => MediaThumb(r.media_id, null, null, null)
        }
      }
    }
  }

  /** STUB resize for NON-image payloads (video frames, text stand-ins):
    * projects the byte stream to the target size deterministically
    * (stride sampling), so the output SHAPE (a payload of exactly w*h
    * bytes) is what a codec would produce. Image payloads should use
    * [[resizeImage]], which is real. */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    if (payload.isEmpty) return out
    var i = 0
    while (i < out.length) {
      out(i) = payload((i.toLong * payload.length / out.length).toInt)
      i += 1
    }
    out
  }

  /** One row of an MP4 sample table: 1-based sample number, absolute
    * byte offset into the file, byte size, and whether the sample is a
    * SYNC sample (keyframe) per `stss`. */
  final case class Mp4Sample(sample: Int, offset: Long, size: Long,
                             sync: Boolean)

  /** REAL MP4 sample-table walk — `moov/trak/mdia/minf/stbl`, the same
    * no-codec discipline as the WAV chunk walk: `stsc` (sample->chunk
    * runs), `stco`/`co64` (chunk offsets), `stsz` (sizes), `stss` (sync
    * samples; absent = every sample is sync) combine into the absolute
    * byte range of every sample. This is header-only arithmetic — the
    * sample PAYLOADS are codec bitstream and stay undecoded — but the
    * ranges are exactly what a real frame extractor seeks to, so a
    * 100 TB video column yields its keyframe byte map at header-read
    * cost. First trak with a complete stbl wins (fine for the
    * single-track corpus fixtures; a multi-track selector would key on
    * `hdlr`). None when any required box is missing or malformed. */
  def mp4SampleTable(p: Array[Byte]): Option[Seq[Mp4Sample]] = {
    def u8(i: Int): Int = p(i) & 0xff
    def be32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def tag(i: Int): String = new String(p.slice(i + 4, i + 8), "US-ASCII")
    // first child box tagged `t` within [from, until): (bodyStart, end)
    def findBox(from: Int, until: Int, t: String): Option[(Int, Int)] = {
      var i = from
      while (i + 8 <= until) {
        val sz = be32(i)
        if (sz < 8 || i + sz > until) return None
        if (tag(i) == t) return Some((i + 8, i + sz.toInt))
        i += sz.toInt
      }
      None
    }
    def u32s(from: Int, until: Int, n: Int, width: Int): Option[Seq[Long]] =
      if (from + n.toLong * width > until) None
      else Some((0 until n).map(k =>
        if (width == 8) be64(from + k * 8) else be32(from + k * 4)))
    for {
      (moovS, moovE) <- findBox(0, p.length, "moov")
      (trakS, trakE) <- findBox(moovS, moovE, "trak")
      (mdiaS, mdiaE) <- findBox(trakS, trakE, "mdia")
      (minfS, minfE) <- findBox(mdiaS, mdiaE, "minf")
      (stblS, stblE) <- findBox(minfS, minfE, "stbl")
      // stsz: ver/flags, uniform sample_size (0 = per-sample table), count
      (szS, szE) <- findBox(stblS, stblE, "stsz")
      if szS + 12 <= szE
      uniform = be32(szS + 4)
      nSamples = be32(szS + 8).toInt
      if nSamples > 0
      sizes <- if (uniform != 0) Some(Seq.fill(nSamples)(uniform))
               else u32s(szS + 12, szE, nSamples, 4)
      // stsc: ver/flags, entry_count, (first_chunk, samples_per_chunk, desc)*
      (scS, scE) <- findBox(stblS, stblE, "stsc")
      if scS + 8 <= scE
      nRuns = be32(scS + 4).toInt
      runs <- u32s(scS + 8, scE, nRuns * 3, 4)
      // chunk offsets: stco (u32) or co64 (u64)
      offs <- findBox(stblS, stblE, "stco").flatMap { case (coS, coE) =>
          u32s(coS + 8, coE, be32(coS + 4).toInt, 4)
        }.orElse(findBox(stblS, stblE, "co64").flatMap { case (coS, coE) =>
          u32s(coS + 8, coE, be32(coS + 4).toInt, 8)
        })
      if nRuns > 0 && offs.nonEmpty
    } yield {
      // stss is OPTIONAL: absent means every sample is a sync sample
      val syncs: Option[Set[Long]] =
        findBox(stblS, stblE, "stss").flatMap { case (ssS, ssE) =>
          u32s(ssS + 8, ssE, be32(ssS + 4).toInt, 4).map(_.toSet)
        }
      // expand stsc runs to per-chunk sample counts, walk samples in
      // chunk order accumulating intra-chunk offsets
      val firstChunks = (0 until nRuns).map(r => runs(r * 3).toInt)
      val perChunk = (0 until nRuns).map(r => runs(r * 3 + 1).toInt)
      val out = Seq.newBuilder[Mp4Sample]
      var sample = 1
      var chunk = 1
      var run = 0
      while (sample <= nSamples && chunk <= offs.length) {
        if (run + 1 < nRuns && chunk >= firstChunks(run + 1)) run += 1
        var within = 0
        var off = offs(chunk - 1)
        while (within < perChunk(run) && sample <= nSamples) {
          val sz = sizes(sample - 1)
          out += Mp4Sample(sample, off, sz,
            syncs.forall(_.contains(sample.toLong)))
          off += sz
          within += 1
          sample += 1
        }
        chunk += 1
      }
      out.result()
    }
  }

  /** REAL MP4 frame sampling, header-only: up to `n` evenly-spaced SYNC
    * samples' byte ranges sliced straight out of the payload — the
    * stored keyframe bitstream, undecoded (no video codec ships in the
    * JDK; DECODE is the one genuinely environment-blocked step).
    * Out-of-bounds ranges (truncated file, lying header) are dropped,
    * not clamped — a partial frame is not a frame. None when the
    * payload has no parseable sample table. */
  def mp4Frames(payload: Array[Byte], n: Int): Option[Seq[Array[Byte]]] =
    if (n < 1) None
    else mp4SampleTable(payload).map { table =>
      val syncs = table.filter(s => s.sync &&
        s.offset + s.size <= payload.length && s.size > 0)
      val take = math.min(n, syncs.length)
      val idx =
        if (take <= 1) Seq(0).take(syncs.length)
        else (0 until take).map(i => (i.toLong * (syncs.length - 1) / (take - 1)).toInt)
      idx.map { i =>
        val s = syncs(i)
        payload.slice(s.offset.toInt, (s.offset + s.size).toInt)
      }
    }.filter(_.nonEmpty)

  /** REAL frame sampling for ANIMATED GIFs via ImageIO's sequence
    * reader — the one multi-frame container the JDK decodes without
    * external codec jars. Samples up to `n` evenly-spaced frames (each
    * frame once — a 3-frame animation asked for 8 yields 3) and
    * re-encodes each as PNG. Frames are the RAW per-frame images as
    * stored: GIF delta frames (partial rectangles under a restore-
    * previous disposal) are returned as-is, NOT composited over their
    * predecessors — compositing needs a sequential decode of every
    * prior frame, which is the wrong cost shape for corpus-scale
    * sampling and irrelevant for the full-frame GIFs synthesized
    * pipelines typically carry. None for anything that is not a
    * decodable GIF (MP4 keyframe byte ranges come from the
    * [[mp4Frames]] sample-table walk instead). */
  def gifFrames(payload: Array[Byte], n: Int): Option[Seq[Array[Byte]]] = {
    if (n < 1 || payload.length < 6 || payload(0) != 'G' ||
        payload(1) != 'I' || payload(2) != 'F') return None
    val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    if (!readers.hasNext) return None
    val reader = readers.next()
    try {
      reader.setInput(new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload)), false, true)
      val total = reader.getNumImages(true)
      if (total < 1) return None
      val take = math.min(n, total)
      val idx =
        if (take == 1) Seq(0)
        else (0 until take).map(i => (i.toLong * (total - 1) / (take - 1)).toInt)
      Some(idx.map { i =>
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(reader.read(i), "png", bos)
        bos.toByteArray
      })
    } catch { case _: Exception => None } // truncated/corrupt animation
    finally reader.dispose()
  }

  final case class MediaFrames(media_id: Long, n_frames: Int,
                               frame_sigs: Seq[String], thumb_len: Int)

  /** Batched resize + frame-sample pass — same mapPartitions shape as
    * [[extractFeatures]], emitting per-frame signatures and the resized
    * thumbnail length. Frames are the REAL [[gifFrames]] decode for
    * animated GIFs and the REAL [[mp4Frames]] keyframe byte ranges for
    * MP4s (sample-table walk, bitstream undecoded); payloads that are
    * neither yield ZERO frames — the honest outcome, a statistic for
    * the caller, not fake bytes. The thumbnail is the REAL
    * [[resizeImage]] when the payload decodes as an image; otherwise
    * the [[resizeStub]] shape. */
  def sampleFrames(media: Dataset[MediaRow], nFrames: Int = 4,
                   thumbW: Int = 32, thumbH: Int = 32): Dataset[MediaFrames] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5")
      rows.map { r =>
        val frames = gifFrames(r.payload, nFrames)
          .orElse(mp4Frames(r.payload, nFrames))
          .getOrElse(Seq.empty)
        val sigs = frames.map(f => md.digest(f).map("%02x".format(_)).mkString)
        val thumb = resizeImage(r.payload, thumbW, thumbH)
          .getOrElse(resizeStub(r.payload, thumbW, thumbH))
        MediaFrames(r.media_id, frames.length, sigs, thumb.length)
      }
    }
  }

  /** Parsed container-header metadata: `format` is null for payloads no
    * parser recognized (the honest outcome for opaque bytes). */
  final case class MediaMeta(media_id: Long, format: String,
                             width: Integer, height: Integer)

  /** REAL (not stubbed) image-container header parse: PNG / JPEG / GIF /
    * BMP dimensions straight from the leading bytes. This is the
    * production technique for metadata extraction at corpus scale —
    * dimensions live in the first kilobyte, so no pixel decode (and no
    * codec library) is needed, and a 100 TB image column yields its
    * width/height histogram at header-read cost. */
  def imageMeta(p: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int): Int = p(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def be32(i: Int): Int = (be16(i) << 16) | be16(i + 2)
    def le32(i: Int): Int = le16(i) | (le16(i + 2) << 16)
    if (p.length >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' &&
        u8(3) == 'G' && u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' &&
        u8(15) == 'R')
      Some(("png", be32(16), be32(20)))
    else if (p.length >= 10 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' &&
        u8(3) == '8' && (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a')
      Some(("gif", le16(6), le16(8)))
    else if (p.length >= 26 && u8(0) == 'B' && u8(1) == 'M')
      Some(("bmp", le32(18), math.abs(le32(22)))) // height < 0 = top-down rows
    else if (p.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // JPEG: walk marker segments to the first SOFn frame header
      var i = 2
      while (i + 9 < p.length) {
        if (u8(i) != 0xff) return None // desynced marker stream
        val m = u8(i + 1)
        if (m == 0xff) i += 1 // fill byte
        else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2 // bare markers
        else if ((m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc)
          return Some(("jpeg", be16(i + 7), be16(i + 5))) // SOFn: height then width
        else i += 2 + be16(i + 2) // skip the segment payload
      }
      None
    } else None
  }

  /** Batched header parse over a media column — same mapPartitions shape
    * as [[extractFeatures]]; unrecognized payloads yield null metadata
    * rather than dropping the row. */
  def extractImageMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        imageMeta(r.payload) match {
          case Some((f, w, h)) => MediaMeta(r.media_id, f, w, h)
          case None            => MediaMeta(r.media_id, null, null, null)
        }
      }
    }
  }

  final case class AudioMeta(media_id: Long, codec: String, channels: Integer,
                             sample_rate: Integer, duration_ms: java.lang.Long)

  /** REAL (not stubbed) WAV/RIFF header parse: PCM format, channel
    * count, sample rate and duration from the fmt/data chunk headers —
    * the audio analog of [[imageMeta]]: everything an audio-corpus
    * metadata pass needs lives in the first ~50 bytes, so a 100 TB
    * audio column yields its duration/sample-rate histogram at
    * header-read cost, no codec library. Walks the RIFF chunk list
    * (chunks are word-aligned), tolerates extra chunks before fmt/data.
    * Returns (codec, channels, sample_rate, duration_ms). */
  def audioMeta(p: Array[Byte]): Option[(String, Int, Int, Long)] = {
    def u8(i: Int): Int = p(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = (le16(i) | (le16(i + 2).toLong << 16)) & 0xffffffffL
    def tag(i: Int): String = new String(p.slice(i, i + 4), "US-ASCII")
    if (p.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int, Int, Long)] = None // (audioFormat, channels, rate, byteRate)
    var dataSize: Option[Long] = None
    while (i + 8 <= p.length && (fmt.isEmpty || dataSize.isEmpty)) {
      val id = tag(i)
      val sz = le32(i + 4)
      if (id == "fmt " && i + 8 + 16 <= p.length)
        fmt = Some((le16(i + 8), le16(i + 10), le32(i + 12).toInt, le32(i + 16)))
      else if (id == "data")
        // the data chunk's declared size is the payload size even when the
        // bytes themselves are elsewhere/truncated — duration is header math
        dataSize = Some(sz)
      i += 8 + sz.toInt + (sz.toInt & 1) // chunks pad to even length
    }
    for ((af, ch, rate, byteRate) <- fmt; ds <- dataSize
         if ch > 0 && rate > 0 && byteRate > 0)
      yield (if (af == 1) "pcm" else if (af == 3) "float" else s"fmt$af",
        ch, rate, ds * 1000L / byteRate)
  }

  /** Batched WAV header parse — same mapPartitions shape as
    * [[extractImageMeta]]; unrecognized payloads keep null metadata. */
  def extractAudioMeta(media: Dataset[MediaRow]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        audioMeta(r.payload) match {
          case Some((c, ch, sr, ms)) => AudioMeta(r.media_id, c, ch, sr, ms)
          case None                  => AudioMeta(r.media_id, null, null, null, null)
        }
      }
    }
  }

  /** Minimal REAL WAV container: RIFF/WAVE + PCM fmt chunk for the
    * given shape + a data chunk of `dataBytes` zero samples. Any WAV
    * reader parses the header; used to synthesize audio-shaped media
    * from row fields. */
  def fakeWav(channels: Int, sampleRate: Int, bitsPerSample: Int,
              dataBytes: Int): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && dataBytes >= 0)
    require(bitsPerSample % 8 == 0 && bitsPerSample > 0)
    val byteRate = sampleRate * channels * (bitsPerSample / 8)
    val blockAlign = channels * (bitsPerSample / 8)
    val out = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(byteRate).putShort(blockAlign.toShort)
      .putShort(bitsPerSample.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataBytes)
    out.array()
  }

  /** Wrap arbitrary bytes in a minimal PNG container (magic + IHDR with
    * the given dimensions + the payload as an IDAT-shaped tail). Used to
    * synthesize image-shaped media from text fixtures; the header is a
    * REAL PNG header that any parser reads. */
  def fakePng(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(33 + payload.length)
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte), 0, 8)
    def be32(v: Int): Unit =
      out.write(Array(v >>> 24, (v >>> 16) & 0xff, (v >>> 8) & 0xff, v & 0xff)
        .map(_.toByte), 0, 4)
    be32(13); out.write("IHDR".getBytes, 0, 4)
    be32(w); be32(h)
    out.write(Array[Byte](8, 6, 0, 0, 0), 0, 5) // bit depth + color type + the three methods
    be32(0) // CRC not validated by header readers
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  final case class VideoMeta(media_id: Long, brand: String,
                             timescale: Integer, duration_ms: java.lang.Long)

  /** MP4 / ISO-BMFF header metadata — the video member of the
    * [[imageMeta]]/[[audioMeta]] family: brand from `ftyp`, timescale +
    * duration from `moov/mvhd` (version 0 and 1 layouts), all within the
    * first ~150 bytes — a 100 TB video column yields its duration
    * histogram at header-read cost, no codec library. Walks top-level
    * boxes by declared BE32 size, then moov's children for mvhd.
    * Returns (brand, timescale, duration_ms). */
  def videoMeta(p: Array[Byte]): Option[(String, Int, Long)] = {
    def u8(i: Int): Int = p(i) & 0xff
    def be32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def tag(i: Int): String = new String(p.slice(i + 4, i + 8), "US-ASCII")
    var brand: Option[String] = None
    var ts: Option[(Int, Long)] = None // (timescale, durationTicks)
    def walkMvhd(i: Int): Unit = {
      val version = u8(i + 8)
      if (version == 1 && i + 8 + 4 + 16 + 12 <= p.length)
        ts = Some((be32(i + 28).toInt, be64(i + 32)))
      else if (version == 0 && i + 8 + 4 + 8 + 8 <= p.length)
        ts = Some((be32(i + 20).toInt, be32(i + 24)))
    }
    def walkChildren(from: Int, until: Int): Unit = {
      var i = from
      while (i + 8 <= until && ts.isEmpty) {
        val sz = be32(i)
        if (sz < 8) return
        if (tag(i) == "mvhd") walkMvhd(i)
        i += sz.toInt
      }
    }
    if (p.length < 8) return None
    var i = 0
    var sawBox = false
    while (i + 8 <= p.length && (brand.isEmpty || ts.isEmpty)) {
      val sz = be32(i)
      if (sz < 8) return if (sawBox) result(brand, ts) else None
      sawBox = true
      tag(i) match {
        case "ftyp" if i + 12 <= p.length =>
          brand = Some(new String(p.slice(i + 8, i + 12), "US-ASCII"))
        case "moov" => walkChildren(i + 8, math.min(i + sz.toInt, p.length))
        case _ =>
      }
      i += sz.toInt
    }
    result(brand, ts)
  }

  private def result(brand: Option[String],
                     ts: Option[(Int, Long)]): Option[(String, Int, Long)] =
    for (b <- brand; (scale, dur) <- ts if scale > 0)
      yield (b, scale, dur * 1000L / scale)

  /** Batched MP4 header parse — same mapPartitions shape as the image
    * and audio passes; unrecognized payloads keep null metadata. */
  def extractVideoMeta(media: Dataset[MediaRow]): Dataset[VideoMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        videoMeta(r.payload) match {
          case Some((b, scale, ms)) => VideoMeta(r.media_id, b, scale, ms)
          case None                 => VideoMeta(r.media_id, null, null, null)
        }
      }
    }
  }

  /** Minimal REAL MP4: `ftyp` (major brand) + `moov` holding a version-0
    * `mvhd` with the given timescale/duration. Any ISO-BMFF reader
    * parses it; used to synthesize video-shaped media from row fields. */
  def fakeMp4(timescale: Int, durationTicks: Long,
              brand: String = "isom"): Array[Byte] = {
    require(timescale > 0 && durationTicks >= 0 && durationTicks <= 0xffffffffL)
    require(brand.length == 4, s"brand must be 4 chars, got '$brand'")
    val mvhd = java.nio.ByteBuffer.allocate(108) // version-0 mvhd box
    mvhd.putInt(108).put("mvhd".getBytes("US-ASCII"))
      .putInt(0)                 // version + flags
      .putInt(0).putInt(0)       // creation / modification
      .putInt(timescale).putInt(durationTicks.toInt)
      .putInt(0x00010000)        // rate 1.0
      .putShort(0x0100.toShort)  // volume 1.0
      .put(new Array[Byte](10))  // reserved
      .put(new Array[Byte](36))  // identity matrix slot (zeros fine for meta)
      .put(new Array[Byte](24))  // pre_defined
      .putInt(2)                 // next_track_ID
    // ftyp = size+type+major+minor+one compatible brand = 20 bytes
    val out = java.nio.ByteBuffer.allocate(20 + 8 + 108)
    out.putInt(20).put("ftyp".getBytes("US-ASCII"))
      .put(brand.getBytes("US-ASCII")).putInt(0)
      .put("mp42".getBytes("US-ASCII"))
    out.putInt(8 + 108).put("moov".getBytes("US-ASCII")).put(mvhd.array())
    out.array()
  }

  private def isoBox(tag: String, body: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8 + body.length)
    b.putInt(8 + body.length).put(tag.getBytes("US-ASCII")).put(body)
    b.array()
  }

  /** Minimal REAL MP4 WITH a sample table — [[fakeMp4]] plus
    * `trak/mdia/minf/stbl` (stsc/stsz/stss/stco) and an `mdat` whose
    * chunk offsets the stco points at for real: sample k (1-based) is
    * `sampleSizes(k-1)` bytes, every byte `(k & 0xff)`, so a slice's
    * content identifies its sample. The structural fixture
    * [[mp4SampleTable]]/[[mp4Frames]] are verified against — the box
    * tree and offset math are exactly ISO-BMFF, only the sample BYTES
    * are synthetic (they'd be codec bitstream in a real file). */
  def fakeMp4WithSamples(sampleSizes: Seq[Int], syncSamples: Seq[Int],
                         samplesPerChunk: Int = 2,
                         timescale: Int = 1000,
                         useCo64: Boolean = false,
                         uniformStsz: Boolean = false): Array[Byte] = {
    require(sampleSizes.nonEmpty && sampleSizes.forall(_ > 0))
    require(samplesPerChunk >= 1)
    val n = sampleSizes.length
    require(syncSamples.forall(s => s >= 1 && s <= n))
    require(!uniformStsz || sampleSizes.distinct.length == 1,
      "uniformStsz needs all sample sizes equal")
    val nChunks = (n + samplesPerChunk - 1) / samplesPerChunk

    def full(tag: String, payload: java.nio.ByteBuffer => Unit,
             len: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4 + len)
      b.putInt(0) // version + flags
      payload(b)
      isoBox(tag, b.array())
    }
    // uniform layout: sample_size != 0, no per-sample table
    val stsz =
      if (uniformStsz) full("stsz", _.putInt(sampleSizes.head).putInt(n), 8)
      else full("stsz", b => {
        b.putInt(0).putInt(n); sampleSizes.foreach(b.putInt(_): Unit)
      }, 8 + 4 * n)
    val stsc = full("stsc",
      _.putInt(1).putInt(1).putInt(samplesPerChunk).putInt(1), 16)
    val stss = full("stss", b => {
      b.putInt(syncSamples.length)
      syncSamples.sorted.foreach(b.putInt(_): Unit)
    }, 4 + 4 * syncSamples.length)
    // chunk-offset box length is fixed by nChunks, so the moov size —
    // and therefore the mdat data offsets — are computable before the
    // offsets are written (the classic muxer two-step)
    val offWidth = if (useCo64) 8 else 4
    val stcoLen = 8 + (4 + 4 + offWidth * nChunks)
    val stblLen = 8 + stsc.length + stsz.length + stss.length + stcoLen
    val minfLen = 8 + stblLen
    val mdiaLen = 8 + minfLen
    val trakLen = 8 + mdiaLen
    // reuse fakeMp4's mvhd: skip its 20-byte ftyp + 8-byte moov header
    val mvhd = fakeMp4(timescale, 0).drop(28)
    val moovLen = 8 + mvhd.length + trakLen
    val dataStart = 20 + moovLen + 8 // ftyp + moov + mdat header
    val chunkOffsets = (0 until nChunks).map { c =>
      dataStart.toLong + sampleSizes.take(c * samplesPerChunk).sum
    }
    val stco =
      if (useCo64) full("co64", b => {
        b.putInt(nChunks); chunkOffsets.foreach(b.putLong(_): Unit)
      }, 4 + 8 * nChunks)
      else full("stco", b => {
        b.putInt(nChunks); chunkOffsets.foreach(o => b.putInt(o.toInt): Unit)
      }, 4 + 4 * nChunks)
    val stbl = isoBox("stbl", stsc ++ stsz ++ stss ++ stco)
    val trak = isoBox("trak", isoBox("mdia", isoBox("minf", stbl)))
    val moov = isoBox("moov", mvhd ++ trak)
    val mdatBody = sampleSizes.zipWithIndex.flatMap { case (sz, i) =>
      Array.fill(sz)(((i + 1) & 0xff).toByte)
    }.toArray
    val ftyp = fakeMp4(timescale, 0).take(20)
    ftyp ++ moov ++ isoBox("mdat", mdatBody)
  }

  /** A REAL animated GIF of solid-color frames, written through the
    * JDK's own GIF sequence writer — the fixture generator for the
    * [[gifFrames]] path (fakeWav/fakeMp4's animated sibling, except
    * nothing about it is fake: any GIF decoder plays it). */
  def makeAnimatedGif(w: Int, h: Int, colors: Seq[Int]): Array[Byte] = {
    require(w > 0 && h > 0 && colors.nonEmpty)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      colors.foreach { rgb =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) }
        finally g.dispose()
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
      ios.flush()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Lift the documents table into the media shape (text bytes as the
    * opaque payload) — the driver's stand-in for a binary media column. */
  def documentsAsMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"),
        lit("text/plain").as("media_type"), col("source"))
      .as[MediaRow]
  }
}
