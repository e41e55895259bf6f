package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing for training-data pipelines: image/audio/video
 * payloads ride as opaque `binary` columns with typed metadata, processed
 * by batched per-partition transforms (the Scala analogue of Python's
 * `mapInPandas` batches) or codegen'd binary expressions.
 *
 * The actual codecs (JPEG/PNG/audio) are NOT available in this
 * environment, so the decode kernels are **clearly-marked deterministic
 * fakes** (`fakeDecode*`): they derive plausible metadata/features from the
 * payload bytes via hashing. Everything around them — schemas, binary
 * column handling, batch shape, partition-parallel execution — is real and
 * is what matters at 100 TB: payload bytes never leave the executor, only
 * small metadata/features shuffle.
 */
object Multimodal {

  /** A media row: id + raw payload + mime hint. */
  case class MediaRow(id: Long, media: Array[Byte], mime: String)

  /** Decoded (stub) image metadata + feature vector. */
  case class DecodedMedia(id: Long, width: Int, height: Int, nChannels: Int,
      nBytes: Long, features: Array[Float])

  /**
   * STUB — deterministic fake image decode (real codec unavailable here):
   * metadata is derived from a 64-bit FNV hash of the payload. Replace the
   * body with an actual codec (e.g. javax.imageio) in a real deployment;
   * the call sites and schemas stay unchanged.
   */
  def fakeDecodeImage(id: Long, bytes: Array[Byte]): DecodedMedia = {
    var h = 0xcbf29ce484222325L // FNV-1a over the payload — deterministic
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    val width = 64 + java.lang.Long.remainderUnsigned(h, 1857).toInt
    val height = 64 + java.lang.Long.remainderUnsigned(h >>> 11, 1017).toInt
    val feat = Array.tabulate(8) { d =>
      val hd = (h ^ (d * 0x9e3779b97f4a7c15L)) * 0x100000001b3L
      (java.lang.Long.remainderUnsigned(hd, 2000) / 1000.0f) - 1.0f
    }
    DecodedMedia(id, width, height, 3, bytes.length.toLong, feat)
  }

  /**
   * Batched partition-level decode: the real 100-TB execution shape —
   * payloads are processed executor-side in batches (like Arrow record
   * batches under mapInPandas), emitting only small decoded rows. No
   * shuffle of payload bytes, parallelism = input splits.
   */
  def decodeImages(media: Dataset[MediaRow],
      batchSize: Int = 64): Dataset[DecodedMedia] = {
    implicit val enc = Encoders.product[DecodedMedia]
    media.mapPartitions { iter =>
      iter.grouped(batchSize).flatMap { batch =>
        // a real decoder would hand the whole batch to native code here
        batch.iterator.map(r => fakeDecodeImage(r.id, r.media))
      }
    }
  }

  /** Wrap a DataFrame with id + binary columns into the typed media
    * Dataset (mime defaults for the stub pipeline). */
  def asMedia(df: DataFrame, idCol: String, binCol: String,
      mime: String = "application/octet-stream"): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("media"),
      lit(mime).as("mime")).as[MediaRow]
  }

  /** Split a binary payload into fixed-size "frames" and keep every
    * `everyN`-th — the video frame-sampling access pattern, as a pure
    * codegen'd expression (substring works on binary). */
  def frameSample(media: Column, frameBytes: Int, everyN: Int): Column = {
    val nFrames = ceil(length(media).cast("double") / frameBytes).cast("int")
    // empty payload ⇒ zero frames (sequence(0, greatest(-1, 0)) would
    // otherwise emit one zero-length frame)
    when(length(media) === 0, array().cast("array<binary>")).otherwise(
      filter(
        transform(sequence(lit(0), greatest(nFrames - 1, lit(0))),
          i => substring(media, (i * frameBytes + 1).cast("int"), lit(frameBytes))),
        (_, i) => i % everyN === 0))
  }

  /** Frame count for a fixed frame size — metadata-only, no decode. */
  def frameCount(media: Column, frameBytes: Int): Column =
    ceil(length(media).cast("double") / frameBytes).cast("int")

  /** STUB resize: a real implementation re-encodes pixels; the stub keeps
    * the byte-budget arithmetic (target/source area ratio) that a planner
    * needs for cost estimation. */
  def resizedByteEstimate(media: Column, srcW: Column, srcH: Column,
      dstW: Int, dstH: Int): Column =
    (length(media).cast("double") * (lit(dstW * dstH).cast("double") /
      (srcW.cast("double") * srcH.cast("double")))).cast("long")
}
