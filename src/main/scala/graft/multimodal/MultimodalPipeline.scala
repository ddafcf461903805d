package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.I / builder mandate): media
  * payloads are opaque `binary` columns with typed metadata; decode /
  * feature-extract runs partition-batched via `Dataset.mapPartitions`
  * (the Scala analog of mapInPandas — one iterator per partition, so a real
  * decoder would amortize codec/model setup per batch, not per row).
  *
  * THIS FILE'S DECODER IS A STUB: `decodeStub` derives deterministic fake
  * dimensions/frames from the payload's md5, standing in ONLY for formats
  * with genuinely no JVM codec in this environment — inter-frame-compressed
  * video (H.264-class) and compressed audio (no ffmpeg-class jar exists
  * here, re-probed every round). Everything around it — schema, binary
  * handling, partitioning, batch shape, fan-out of per-frame rows — is
  * real and oracle-checked (the md5 arithmetic is replicated in SQL).
  * For PNG/BMP/JPEG images and PCM WAV audio the decode IS real
  * ([[JdkMedia]], q_image_codec / q_audio_codec), and as of r17 per-frame
  * VIDEO decode is real too via the MJPEG-style frames-in-a-container
  * path ([[JdkMedia.videoPayload]] / [[JdkMedia.decodeVideo]],
  * q_video_codec) — every frame passes through the JDK's ImageIO codec
  * on both sides.
  */
object MultimodalPipeline {

  /** One media object: opaque bytes + source-declared type. */
  case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Decoded-media features; frame_hashes are the per-sampled-frame content
    * digests (what a real pipeline would feed to an embedding model).
    */
  case class MediaFeatures(
      doc_id: Long, media_type: String, byte_len: Int,
      width: Int, height: Int, n_frames: Int,
      frame_hashes: Seq[String])

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  private def hexVal(c: Char): Int = "0123456789abcdef".indexOf(c)

  /** ??? real codec goes here ??? — deterministic fake decode: dimensions
    * and frame count derived from the content hash. Signature and batch
    * position are what a libjpeg/ffmpeg-backed version would keep.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int, String) = {
    val h = md5Hex(payload)
    val width = 64 + 8 * hexVal(h(0))
    val height = 64 + 8 * hexVal(h(1))
    val nFrames = 1 + hexVal(h(2)) % 8
    (width, height, nFrames, h)
  }

  /** The media table derived from documents: text bytes stand in for image
    * payloads (deterministic, so the oracle can rebuild them).
    */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** Partition-batched decode + feature extraction. Each partition's
    * iterator is processed as one batch — setup cost (a real codec handle,
    * a model session) would be paid here once per partition.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // per-partition setup for a real decoder would happen HERE
      batch.map { rec =>
        val (w, h, nf, hex) = decodeStub(rec.payload)
        val frames = (0 until nf).map(i => md5Hex(s"$hex:$i".getBytes("UTF-8")))
        MediaFeatures(rec.doc_id, rec.media_type, rec.payload.length, w, h, nf, frames)
      }
    }
  }

  /** Frame sampling: fan the decoded frames out to one row each (the shape
    * fed to per-frame embedding / resize stages).
    */
  def sampleFrames(features: Dataset[MediaFeatures]): DataFrame =
    features.select(col("doc_id"), col("media_type"),
        posexplode(col("frame_hashes")).as(Seq("frame_idx", "frame_hash")))

  /** Resize to a fixed width preserving aspect ratio (integer arithmetic so
    * the oracle reproduces it exactly). A real implementation would rescale
    * pixel buffers here, batch-wise; the dimension math is the real part.
    */
  def resize(features: Dataset[MediaFeatures], targetW: Int = 224): Dataset[MediaFeatures] = {
    import features.sparkSession.implicits._
    features.mapPartitions { batch =>
      batch.map { f =>
        val rh = (f.height.toLong * targetW / f.width).toInt
        f.copy(width = targetW, height = rh)
      }
    }
  }
}
