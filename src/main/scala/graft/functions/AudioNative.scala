package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Native evaluator for the audio signal-statistics decode
  * ([[graft.operators.MediaCodec.decodeAudioStats]] — canonical PCM16
  * WAV, or 16-bit FLAC via [[graft.operators.FlacCodec]]): binary
  * payload → the eight-long stats vector `[n_frames, channels, sum_abs,
  * sum_sq, max_abs, zero_crossings, silence_frames, clip_frames]`, NULL
  * for anything that decodes as neither — callers branch on the NULL the
  * way the other decode seams degrade to the byte-span path.
  *
  * One tight JVM pass over the sample bytes (the [[PhashNative]]
  * rationale: a HOF formulation would re-walk the byte string per
  * statistic, interpreted); every output is an exact long, so the
  * downstream quality gates (RMS/silence/clipping thresholds) are
  * integer comparisons with a DuckDB-replayable contract for
  * constructed payloads.
  */
object AudioNative {

  def audioStats(bin: Column): Column =
    GraftColumnBridge.column(AudioStats(GraftColumnBridge.expression(bin)))

  case class AudioStats(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes() = {
      if (child.dataType == BinaryType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"audio_stats requires a BINARY input, got ${child.dataType.catalogString}")
    }
    override protected def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      graft.operators.MediaCodec.decodeAudioStats(bytes) match {
        case Some(stats) =>
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            stats.map(Long.box).toArray[Any])
        case None => null
      }
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }
}
