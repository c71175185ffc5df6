package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §7.5): media as opaque binary
  * payloads with typed metadata, decoded/feature-extracted in batched
  * per-partition passes.
  *
  * The actual media decode is STUBBED (this container ships no image/audio
  * codecs): [[decodeStub]] derives deterministic fake features from the
  * bytes. Everything around it — the schema, the Dataset plumbing, the
  * mapPartitions batch shape, partition sizing — is real: swap
  * `decodeStub` for a codec call and the pipeline is production-shaped.
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

  /** STUB resize: a real implementation decodes, scales, and re-encodes;
    * the fake projects the byte stream to the target size deterministically
    * (stride sampling), so the output SHAPE (a payload of exactly w*h
    * bytes) is what a codec would produce. */
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

  /** STUB frame sampling: a real implementation seeks keyframes; the fake
    * cuts `n` evenly-spaced fixed-width windows from the byte stream. */
  def frameSampleStub(payload: Array[Byte], n: Int, frameLen: Int = 16): Seq[Array[Byte]] =
    (0 until n).map { i =>
      val start = if (n == 1) 0 else (i.toLong * math.max(payload.length - frameLen, 0) / math.max(n - 1, 1)).toInt
      payload.slice(start, math.min(start + frameLen, payload.length))
    }

  final case class MediaFrames(media_id: Long, n_frames: Int,
                               frame_sigs: Seq[String], thumb_len: Int)

  /** Batched resize + frame-sample pass — same mapPartitions shape as
    * [[extractFeatures]], emitting per-frame signatures and the resized
    * thumbnail length. */
  def sampleFrames(media: Dataset[MediaRow], nFrames: Int = 4,
                   thumbW: Int = 32, thumbH: Int = 32): Dataset[MediaFrames] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5")
      rows.map { r =>
        val frames = frameSampleStub(r.payload, nFrames)
        val sigs = frames.map(f => md.digest(f).map("%02x".format(_)).mkString)
        val thumb = resizeStub(r.payload, thumbW, thumbH)
        MediaFrames(r.media_id, frames.length, sigs, thumb.length)
      }
    }
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
