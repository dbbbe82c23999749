package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata. The Spark-side shape — schema,
  * batched per-partition processing, deterministic partitioning — is real
  * and tested; the actual media decode is STUBBED (no image/audio libs in
  * this container) behind `FakeDecoder`, which derives metadata
  * deterministically from the bytes so results are oracle-checkable.
  */
object Multimodal {

  /** Deterministic stand-in for a media decoder. A real deployment swaps
    * this object for JNI/FFI decoder calls; everything around it (schema,
    * batching, partitioning) is unchanged.
    */
  object FakeDecoder {
    /** "Decode" image dims from the payload: stable function of byte stats. */
    def dims(bytes: Array[Byte]): (Int, Int) = {
      val n = bytes.length
      (64 + (n % 1024), 64 + ((n * 7) % 768))
    }
    def nFrames(bytes: Array[Byte]): Int = 1 + (bytes.length % 30)
  }

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int,
                             n_frames: Int, content_md5: String)

  /** Binary metadata extraction as pure Column ops (no decode needed):
    * byte length + content hash — the cheap always-on pass.
    */
  def binaryMeta(media: DataFrame, idCol: String = "doc_id",
                 payloadCol: String = "payload"): DataFrame =
    media.select(col(idCol), octet_length(col(payloadCol)).cast("long").as("n_bytes"),
      md5(col(payloadCol)).as("content_md5"))

  /** Batched per-partition "decode" (the Scala analogue of mapInPandas):
    * one decoder instance per partition, streamed rows, typed output.
    * Swap FakeDecoder for a real codec without touching the plan shape.
    */
  def decodeMeta(media: DataFrame, idCol: String = "doc_id",
                 payloadCol: String = "payload"): Dataset[MediaMeta] = {
    val typed = media.select(col(idCol).cast("long").as("doc_id"),
      col(payloadCol).as("payload")).as(Encoders.product[MediaRow])
    typed.mapPartitions { rows =>
      // per-partition init point for a real decoder handle
      rows.map { r =>
        val (w, h) = FakeDecoder.dims(r.payload)
        val hash = java.security.MessageDigest.getInstance("MD5")
          .digest(r.payload).map("%02x".format(_)).mkString
        MediaMeta(r.doc_id, r.payload.length.toLong, w, h,
          FakeDecoder.nFrames(r.payload), hash)
      }
    }(Encoders.product[MediaMeta])
  }

  /** Frame sampling stub: explode a video payload into every `stride`-th
    * frame index with a per-frame byte slice — the partition/schema shape of
    * real frame extraction.
    */
  def sampleFrames(media: DataFrame, stride: Int, idCol: String = "doc_id",
                   payloadCol: String = "payload"): DataFrame =
    media.select(col(idCol), octet_length(col(payloadCol)).as("n_bytes"),
      explode(sequence(lit(0),
        ((octet_length(col(payloadCol)) % 30) / lit(stride)).cast("int")))
        .as("frame_idx"))
      .withColumn("frame_off", col("frame_idx") * stride)
}
