package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{MediaCodec, Multimodal}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val png = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a).map(_.toByte)
  val jpeg = Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte)
  val wav = Array(0x52, 0x49, 0x46, 0x46, 0x24, 0x00).map(_.toByte)
  val junk = "hello".getBytes("UTF-8")

  test("magic sniffing works in both scala and expression paths") {
    assert(Multimodal.sniffFormat(png) === "png")
    assert(Multimodal.sniffFormat(jpeg) === "jpeg")
    assert(Multimodal.sniffFormat(wav) === "riff")
    assert(Multimodal.sniffFormat(junk) === "unknown")

    import spark.implicits._
    val df = Seq((1L, png), (2L, jpeg), (3L, wav), (4L, junk))
      .toDF("id", "media")
    val out = Multimodal.withMediaMeta(df, "media")
      .select("id", "format")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "png", 2L -> "jpeg", 3L -> "riff", 4L -> "unknown"))
  }

  test("decode stub produces deterministic fixed-width features") {
    import spark.implicits._
    val ds = Seq(Multimodal.MediaRow(1L, junk, "unknown"),
      Multimodal.MediaRow(2L, png, "png")).toDS()
    val feats = Multimodal.decodeFeatures(ds, dim = 8).collect()
      .map(f => f.id -> f).toMap
    assert(feats(1L).features.length === 8)
    assert(feats(1L).byte_len === 5)
    assert(feats(1L).features.toSeq === MediaCodec.decodeStub(junk, 8).toSeq)
  }

  test("frame sample takes every stride-th byte up to maxFrames") {
    import spark.implicits._
    val bytes = Array.tabulate(300)(i => (i % 256).toByte)
    val df = Seq((1L, bytes)).toDF("id", "media")
    val frames = Multimodal.frameSample(df, "media", 100, 8)
      .select(col("frames")).collect().head.getSeq[Array[Byte]](0)
    assert(frames.length === 3) // ceil(300/100) = offsets 0,100,200 — no phantom frame
    assert(frames.head.head === 0.toByte)
    assert(frames(1).head === 100.toByte)
    // stride divides length exactly: still no empty trailing frame
    val exact = Multimodal.frameSample(
      Seq((1L, Array.tabulate(200)(_.toByte))).toDF("id", "media"), "media", 100, 8)
      .select(col("frames")).collect().head.getSeq[Array[Byte]](0)
    assert(exact.length === 2)
    assert(exact.forall(_.length === 1))
    // maxFrames cap
    val capped = Multimodal.frameSample(df, "media", 10, 8)
      .select(col("frames")).collect().head.getSeq[Array[Byte]](0)
    assert(capped.length === 8)
  }
}
