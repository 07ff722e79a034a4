package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{MediaCodec, Multimodal, PerceptualHash}
import graft.queries.SyntheticGif

class Round14OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ---- SyntheticGif: the SQL-constructed GIF really decodes -----------

  /** Pure-Scala twin of SyntheticGif's generating formula. */
  private def pixIdx(id: Long, k: Int, c: Int): Int =
    ((id * 11 + k * 17 + (c % 9) * 23 + (c / 9) * 5) % 128).toInt

  private def gifBytes(id: Long): Array[Byte] = {
    val nf = (1 + id % 3).toInt
    val sb = new StringBuilder(SyntheticGif.headerHex)
    for (k <- 0 until nf) {
      sb.append("2C000000000900070000").append("0741").append("80")
      for (c <- 0 until 63) sb.append(f"${pixIdx(id, k, c)}%02X")
      sb.append("8100")
    }
    sb.append("3B")
    sb.toString.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  }

  private def expectedHash(id: Long, k: Int): Long = {
    val cells = Array.tabulate(63)(c => 2L * pixIdx(id, k, c))
    var f = 0L
    for (b <- 0 until 56) {
      val i = (b / 8) * 9 + (b % 8)
      if (cells(i) > cells(i + 1)) f |= 1L << b
    }
    f
  }

  test("SyntheticGif: hand-rolled uncompressed-LZW GIF decodes to the formula grids") {
    for (id <- Seq(0L, 1L, 2L, 5L, 41L, 127L, 1000L)) {
      val bytes = gifBytes(id)
      assert(Multimodal.sniffFormat(bytes) === "gif")
      val frames = MediaCodec.decodeGifFrames(bytes, 32)
        .getOrElse(fail(s"id=$id: JDK reader rejected the constructed GIF"))
      assert(frames.length === (1 + id % 3).toInt, s"id=$id frame count")
      for ((grid, k) <- frames.zipWithIndex) {
        val want = Array.tabulate(63)(c => (2 * pixIdx(id, k, c)).toByte)
        assert(grid.toSeq === want.toSeq, s"id=$id frame=$k grid")
      }
    }
  }

  test("SyntheticGif: Spark-side mediaSql expr matches the byte-level twin") {
    import spark.implicits._
    val df = Seq(0L, 1L, 2L, 7L, 63L).toDF("doc_id")
      .withColumn("media", expr(SyntheticGif.mediaSql("doc_id")))
    val got = df.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    for ((id, bytes) <- got)
      assert(bytes.toSeq === gifBytes(id).toSeq, s"id=$id payload")
  }

  test("videoFramePhashes over SyntheticGif payloads = formula dHash") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L, 3L, 10L, 100L)
    val df = ids.toDF("doc_id")
      .withColumn("media", expr(SyntheticGif.mediaSql("doc_id")))
    val out = Multimodal.videoFramePhashes(df, "doc_id", "media")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = (for {
      id <- ids; k <- 0 until (1 + id % 3).toInt
    } yield (id, k.toLong) -> expectedHash(id, k)).toMap
    assert(out === want)
  }
}
