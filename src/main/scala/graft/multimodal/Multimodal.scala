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
