package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

import graft.operators.PerceptualHash

/** Native evaluator for the perceptual dHash fingerprint
  * ([[graft.operators.PerceptualHash]]): binary payload → 9×7 integer
  * mean-byte grid → 56 horizontal-gradient bits, in one tight JVM pass
  * over the bytes.
  *
  * Exists for the same reason as [[HashNative]]: the HOF formulation
  * (`transform(sequence(0,62), k -> aggregate(...conv(substring(hex...))))`
  * feeding an `aggregate` that reads the cell array 112 times) evaluates
  * interpreted — Spark higher-order functions have no codegen — and
  * measured ~2 ms per fingerprint at 300-byte payloads (4-5 s for 2 000
  * segment fingerprints in `mm_segment_dedup`). This loop is O(bytes + 63)
  * with no hex detour and no per-byte allocation.
  *
  * Parity: computes EXACTLY the integer math of
  * [[PerceptualHash.duckGridCells]] + [[PerceptualHash.duckDHashBits]]
  * (the DuckDB oracle): cell k spans bytes [k·bn div 63, (k+1)·bn div 63)
  * of the payload, its value is the floor-mean of the UNSIGNED byte
  * values (empty spans are 0), and gradient bit b (0-based, b = r·8+c) is
  * set iff cell(r·9+c) > cell(r·9+c+1). All quantities are nonnegative
  * longs; bit 55 is the highest ever set, so the fingerprint, its banded
  * chunk extraction (div/mod) and XOR/bit_count verify stay in
  * nonnegative BIGINT range in both engines.
  */
object PhashNative {

  /** 56-bit dHash fingerprint of a binary column (null → null; empty
    * payloads hash like the all-zero grid, i.e. 0 — callers filter empties
    * before the pair join, as before). */
  def dhash56(bin: Column): Column =
    GraftColumnBridge.column(DHash56(GraftColumnBridge.expression(bin)))

  /** Decodable payloads → their REAL 63-cell perceptual grid: PNG/JPEG
    * via the 9×7 grayscale grid
    * ([[graft.operators.MediaCodec.decodeImageGrid]], JDK ImageIO), PCM
    * WAV or FLAC via the 63-window amplitude envelope
    * ([[graft.operators.MediaCodec.decodeAudioEnvelope]] — WAV first,
    * then the [[graft.operators.FlacCodec]] door; volume-invariant);
    * anything else passes through unchanged. Composed as
    * `dhash56(imageGridOrRaw(b))` this gives a true image dHash for real
    * images, a true audio difference-hash for real PCM/FLAC audio (63
    * grid bytes = one byte per cell, so the byte-span grid IS the signal
    * grid), and the byte-span fingerprint for other payloads — the
    * production pipeline downstream is identical in all three cases.
    * Note the decoded branches are not DuckDB-replayable (no codec
    * there); oracle queries run on non-media payloads or recompute the
    * envelope from the generating formula, and the decoded paths are
    * pinned by MultimodalSpec's hand-computed PNG and WAV fingerprints
    * plus FlacCodecSpec's FLAC≡WAV envelope identity. */
  def imageGridOrRaw(bin: Column): Column =
    GraftColumnBridge.column(ImageGridOrRaw(GraftColumnBridge.expression(bin)))

  /** Video payloads → their per-frame 63-cell luma grids, bounded to
    * `maxFrames`; empty array for anything else. The real video-frame
    * decode path ([[graft.operators.MediaCodec.decodeVideoFrames]]:
    * animated GIF stored rasters + MJPEG-in-AVI `movi` chunks — the two
    * multi-frame containers the JDK decodes; true codecs stay behind the
    * stub) — compose `dhash56` over the exploded grids for frame-level
    * perceptual dedup. The GIF branch IS DuckDB-replayable for
    * SyntheticGif-constructed payloads (mm_video_frames); the JPEG
    * branch is pinned by MultimodalSpec's constructed MJPEG AVI. */
  def videoFrameGrids(bin: Column, maxFrames: Int): Column =
    GraftColumnBridge.column(
      VideoFrameGrids(GraftColumnBridge.expression(bin), maxFrames))

  case class VideoFrameGrids(child: Expression, maxFrames: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(BinaryType, containsNull = false)
    override def checkInputDataTypes() = {
      if (child.dataType == BinaryType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"video_frame_grids requires a BINARY input, got ${child.dataType.catalogString}")
    }
    override protected def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      val frames = graft.operators.MediaCodec
        .decodeVideoFrames(bytes, maxFrames)
        .getOrElse(Seq.empty)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        frames.toArray[Any])
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  case class ImageGridOrRaw(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def checkInputDataTypes() = {
      if (child.dataType == BinaryType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"image_grid_or_raw requires a BINARY input, got ${child.dataType.catalogString}")
    }
    override protected def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      graft.operators.MediaCodec.decodeImageGrid(bytes)
        .orElse(graft.operators.MediaCodec.decodeAudioEnvelope(bytes))
        .getOrElse(bytes)
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  case class DHash56(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    // analysis-time type check: a non-binary input should fail in the
    // analyzer, not as a runtime ClassCastException mid-job (the
    // VecDot/JaroWinkler discipline)
    override def checkInputDataTypes() = {
      if (child.dataType == BinaryType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dhash56 requires a BINARY input, got ${child.dataType.catalogString}")
    }
    override protected def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      val bn = bytes.length.toLong
      val cells = new Array[Long](PerceptualHash.Cells)
      var k = 0
      while (k < PerceptualHash.Cells) {
        val st = k * bn / PerceptualHash.Cells
        val en = (k + 1) * bn / PerceptualHash.Cells
        if (en > st) {
          var sum = 0L
          var i = st
          while (i < en) {
            sum += (bytes(i.toInt) & 0xFF).toLong
            i += 1
          }
          cells(k) = sum / (en - st)
        }
        k += 1
      }
      var f = 0L
      var b = 0
      while (b < PerceptualHash.Bits) {
        val idx = (b / 8) * PerceptualHash.GridW + (b % 8)
        if (cells(idx) > cells(idx + 1)) f |= 1L << b
        b += 1
      }
      f
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }
}
