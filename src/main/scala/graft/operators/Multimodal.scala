package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video payloads ride through the
  * engine as opaque `binary` columns with typed metadata; decode /
  * feature-extraction runs as a partition-local batch transform.
  *
  * The Spark-side plumbing here is real and tested — schema, partitioning,
  * batch iteration shape, magic-byte sniffing — while the actual codec call
  * is STUBBED behind [[MediaCodec.decodeStub]] (this container ships no
  * image/audio libraries): it produces a deterministic fake feature vector
  * from the bytes. Swapping in a real decoder (JNI ffmpeg, ImageIO, an ONNX
  * encoder) changes exactly that one function; everything else — including
  * the 100 TB behavior (no shuffle, executor-local batches, fixed-width
  * output schema) — is already in place.
  */
object Multimodal {

  final case class MediaRow(id: Long, media: Array[Byte], format: String)
  final case class MediaFeatures(id: Long, format: String, byte_len: Int,
      features: Array[Float])

  /** Container format from magic bytes — real detection logic. */
  def sniffFormat(bytes: Array[Byte]): String = {
    def startsWith(sig: Int*): Boolean =
      bytes.length >= sig.length &&
        sig.zipWithIndex.forall { case (b, i) => (bytes(i) & 0xff) == b }
    if (startsWith(0x89, 0x50, 0x4e, 0x47)) "png"
    else if (startsWith(0xff, 0xd8, 0xff)) "jpeg"
    else if (startsWith(0x52, 0x49, 0x46, 0x46)) "riff" // wav/avi container
    else if (startsWith(0x49, 0x44, 0x33)) "mp3"
    else "unknown"
  }

  /** Columnar metadata projection over a binary column: byte length + magic
    * format — pure codegen'd expressions (binary-literal prefix compares),
    * no UDF, so the projection rides inside whole-stage codegen. */
  def withMediaMeta(df: DataFrame, binCol: String): DataFrame = {
    def sig(bytes: Int*) = lit(bytes.map(_.toByte).toArray)
    val b = col(binCol)
    df.withColumn("byte_len", length(b))
      .withColumn("format",
        when(substring(b, 1, 4) === sig(0x89, 0x50, 0x4e, 0x47), "png")
          .when(substring(b, 1, 3) === sig(0xff, 0xd8, 0xff), "jpeg")
          .when(substring(b, 1, 4) === sig(0x52, 0x49, 0x46, 0x46), "riff")
          .when(substring(b, 1, 3) === sig(0x49, 0x44, 0x33), "mp3")
          .otherwise("unknown"))
  }

  /** Deterministic byte sampling: every `stride`-th byte of the payload,
    * bounded to `maxFrames` — the plumbing shape of video frame-sampling
    * (slice positions are where a real demuxer would seek). Frame count is
    * ceil(len/stride) capped at maxFrames, so every sampled position lies
    * strictly inside the payload (no phantom empty frames when stride
    * divides the length) and empty payloads produce empty frame lists. */
  def frameSample(df: DataFrame, binCol: String, stride: Int,
      maxFrames: Int): DataFrame =
    df.withColumn("frames", expr(
      s"""CASE WHEN length($binCol) = 0 OR $binCol IS NULL THEN CAST(array() AS ARRAY<BINARY>)
         |ELSE transform(
         |  sequence(0, least(int((length($binCol) + ${stride - 1}) div $stride) - 1, ${maxFrames - 1})),
         |  i -> substring($binCol, i * $stride + 1, 1)) END""".stripMargin))

  /** Partition-local batch "decode" + feature extraction. The iterator shape
    * (consume a partition's rows as one batch stream, emit fixed-width
    * vectors) is exactly what a real model-inference UDF needs; only
    * [[MediaCodec.decodeStub]] is fake. */
  def decodeFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      rows.map { r =>
        MediaFeatures(r.id, r.format,
          if (r.media == null) 0 else r.media.length,
          MediaCodec.decodeStub(r.media, dim))
      }
    }
  }
}

/** The codec seam. Everything above this call is production plumbing;
  * this function is the marked stub. */
object MediaCodec {
  /** STUB — no media libraries in this container. Deterministic fake
    * features: a rolling byte hash folded into `dim` float lanes. A real
    * implementation would decode and run an encoder here. */
  def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) {
        out(i % dim) = out(i % dim) * 31f + (bytes(i) & 0xff)
        out(i % dim) = out(i % dim) % 997f
        i += 1
      }
    }
    out
  }
}
