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

  test("header parsing: real PNG/JPEG/WAV leading bytes yield their fields") {
    import spark.implicits._
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // real 8x1 PNG IHDR prefix (width 8, height 1)
    val pngHdr = b(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R', 0, 0, 0, 8, 0, 0, 0, 1, 8, 6, 0, 0)
    // JPEG: SOI, APP0 (len 4, 2 payload bytes), SOF0 len 17: precision 8,
    // height 0x0010 (16), width 0x0020 (32), 3 components
    val jpgHdr = b(0xff, 0xd8, 0xff, 0xe0, 0, 4, 0x4a, 0x46,
      0xff, 0xc0, 0, 17, 8, 0, 16, 0, 32, 3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    // WAV: RIFF/WAVE/fmt, PCM, 2 channels, 44100 Hz (LE)
    val wavHdr = b('R', 'I', 'F', 'F', 0x24, 0, 0, 0, 'W', 'A', 'V', 'E',
      'f', 'm', 't', ' ', 16, 0, 0, 0, 1, 0, 2, 0, 0x44, 0xac, 0, 0)
    // malformed JPEG chain (length points past the payload) -> NULL dims
    val badJpg = b(0xff, 0xd8, 0xff, 0xe0, 0xff, 0xff, 1, 2, 3)
    val out = Multimodal.withMediaHeaders(
        Seq((1L, pngHdr), (2L, jpgHdr), (3L, wavHdr), (4L, badJpg))
          .toDF("id", "media"), "media")
      .select("id", "format", "width", "height", "channels", "sample_rate")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.get(2)), Option(r.get(3)),
         Option(r.get(4)), Option(r.get(5)))).toMap
    assert(out(1L) === (("png", Some(8L), Some(1L), None, None)))
    assert(out(2L) === (("jpeg", Some(32L), Some(16L), None, None)))
    assert(out(3L) === (("riff", None, None, Some(2L), Some(44100L))))
    assert(out(4L) === (("jpeg", None, None, None, None)))
  }

  test("phash pairs: identical and lightly-edited payloads pair, distinct don't") {
    import spark.implicits._
    // payloads long enough for a meaningful 63-cell grid; b is a copy of a
    // with a few bytes perturbed (the "re-encoded image" case), c is
    // unrelated noise, d is empty (degenerate — must be excluded)
    val rnd = new scala.util.Random(7)
    val a = Array.tabulate(630)(i => ((i * 37 + 11) % 251).toByte)
    val b = a.clone(); for (i <- Seq(5, 300, 599)) b(i) = (b(i) + 3).toByte
    val c = Array.tabulate(630)(_ => rnd.nextInt(256).toByte)
    val df = Seq((1L, a), (2L, b), (3L, c), (4L, Array.empty[Byte]))
      .toDF("id", "media")
    val pairs = Multimodal.phashPairs(df, "id", "media", maxHamming = 6)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)), "near-identical payloads must pair")
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L), "empty payload excluded")
    // identical payloads → hamming 0
    val same = Multimodal.phashPairs(
      Seq((1L, a), (2L, a.clone())).toDF("id", "media"), "id", "media")
    assert(same.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet === Set((1L, 2L, 0L)))
    pairs.unpersist(); same.unpersist()
  }

  test("native dhash56 matches the hand fingerprint on a 1-byte-per-cell grid") {
    import spark.implicits._
    // 63 bytes → each grid cell is exactly one byte; alternate 200/100 so
    // cell(i) > cell(i+1) iff i is even. Bit b (= r·8+c) reads cell
    // r·9+c, whose parity is (r+c) mod 2 flipped by r (9 ≡ 1 mod 2):
    // row r even → bits at even c (0x55), row r odd → odd c (0xAA)
    val bytes = Array.tabulate(63)(i =>
      (if (i % 2 == 0) 200 else 100).toByte)
    val got = Seq((1L, bytes)).toDF("id", "media")
      .select(graft.functions.PhashNative.dhash56(col("media")).as("f"))
      .head().getLong(0)
    assert(got === 0x55AA55AA55AA55L)
    // empty payload → all-zero grid → fingerprint 0 (callers filter these)
    val empty = Seq((1L, Array.empty[Byte])).toDF("id", "media")
      .select(graft.functions.PhashNative.dhash56(col("media")).as("f"))
      .head().getLong(0)
    assert(empty === 0L)
  }

  test("real PNG decode matches the hand-computed grid and fingerprint") {
    import spark.implicits._
    import graft.operators.{MediaCodec, PerceptualHash}
    // 18×14 gray PNG, 2×2 pixels per grid cell, columns alternating
    // 200/100 by CELL: pure-gray luma is exact (299+587+114 = 1000), so
    // every cell is exactly 200 or 100 and bit b (= r·8+c) is set iff c is
    // even → 0x55 per row byte → 0x55555555555555
    val img = new java.awt.image.BufferedImage(18, 14,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 18; y <- 0 until 14) {
      val v = if ((x / 2) % 2 == 0) 200 else 100
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    assert(graft.operators.Multimodal.sniffFormat(png) == "png")
    val grid = MediaCodec.decodeImageGrid(png).get
    assert(grid.length == PerceptualHash.Cells)
    for (k <- 0 until PerceptualHash.Cells) {
      val want = if ((k % PerceptualHash.GridW) % 2 == 0) 200 else 100
      assert((grid(k) & 0xff) == want, s"cell $k")
    }
    val fp = Seq((1L, png)).toDF("id", "media")
      .select(graft.functions.PhashNative.dhash56(
        graft.functions.PhashNative.imageGridOrRaw(col("media"))).as("f"))
      .head().getLong(0)
    assert(fp === 0x55555555555555L)
    // non-image payloads pass through imageGridOrRaw unchanged
    val raw = Array.tabulate(63)(i => (if (i % 2 == 0) 200 else 100).toByte)
    val viaGrid = Seq((1L, raw)).toDF("id", "media")
      .select(graft.functions.PhashNative.dhash56(
        graft.functions.PhashNative.imageGridOrRaw(col("media"))).as("f"))
      .head().getLong(0)
    val direct = Seq((1L, raw)).toDF("id", "media")
      .select(graft.functions.PhashNative.dhash56(col("media")).as("f"))
      .head().getLong(0)
    assert(viaGrid === direct)
  }

  test("real PCM WAV decode: hand envelope, volume invariance, stereo fold") {
    import graft.operators.{MediaCodec, PerceptualHash}
    def wav(samples: Array[Int], channels: Int): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
      bb.putShort(1); bb.putShort(channels.toShort)
      bb.putInt(8000); bb.putInt(8000 * 2 * channels)
      bb.putShort((2 * channels).toShort); bb.putShort(16)
      bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
      samples.foreach(s0 => bb.putShort(s0.toShort))
      bb.array()
    }
    val cells = PerceptualHash.Cells
    // 63 mono frames, |amplitude| (f+1)·100 with alternating sign:
    // envelope (f+1)·100, max 6300 → byte = (f+1)·255/63 exactly
    def amp(f: Int, scale: Int) =
      (if (f % 2 == 0) 1 else -1) * (f + 1) * scale
    val mono = wav(Array.tabulate(cells)(f => amp(f, 100)), 1)
    val env = MediaCodec.decodeWavEnvelope(mono).get
    assert(env.length === cells)
    for (f <- 0 until cells)
      assert((env(f) & 0xff) === (f + 1) * 255 / 63, s"window $f")
    // uniform gain change (half volume) → IDENTICAL normalized envelope
    val half = wav(Array.tabulate(cells)(f => amp(f, 50)), 1)
    assert(MediaCodec.decodeWavEnvelope(half).get.toSeq === env.toSeq)
    // stereo with both channels equal folds to the mono envelope
    val stereo = wav(Array.tabulate(cells * 2)(i => amp(i / 2, 100)), 2)
    assert(MediaCodec.decodeWavEnvelope(stereo).get.toSeq === env.toSeq)
    // malformed payloads degrade to None, never throw: too short, and a
    // non-PCM format tag (2 = ADPCM needs a codec, exactly what the
    // fallback contract excludes); a data-truncated file still decodes
    // over the frames it has (the min() clamp) rather than failing
    assert(MediaCodec.decodeWavEnvelope(mono.take(40)).isEmpty)
    val adpcm = mono.clone(); adpcm(20) = 2 // fmt audioFormat LE lo byte
    assert(MediaCodec.decodeWavEnvelope(adpcm).isEmpty)
    assert(MediaCodec.decodeWavEnvelope(mono.take(50)).isDefined)
    // a crafted chunk size near u32-max must NOT wrap the cursor negative
    // and index before the array — the Long walk just runs off the end
    val huge = mono.clone()
    huge(16) = 0xf8.toByte; huge(17) = 0xff.toByte // fmt chunk size
    huge(18) = 0xff.toByte; huge(19) = 0xff.toByte //  = 0xfffffff8
    assert(MediaCodec.decodeWavEnvelope(huge).isEmpty)
    val hugeData = mono.clone() // data-chunk size 0xfffffff8: dataLen
    hugeData(40) = 0xf8.toByte; hugeData(41) = 0xff.toByte // clamps to
    hugeData(42) = 0xff.toByte; hugeData(43) = 0xff.toByte // real bytes
    assert(MediaCodec.decodeWavEnvelope(hugeData).get.toSeq === env.toSeq)
    // and decode() routes WAV through the real envelope, not the stub
    assert(MediaCodec.decode(mono, 8).toSeq ===
      MediaCodec.decode(half, 8).toSeq)
    assert(MediaCodec.decode(mono, 8).toSeq !==
      MediaCodec.decodeStub(mono, 8).toSeq)
    // e2e perceptual path: dhash56(imageGridOrRaw(wav)) = the envelope's
    // difference hash, and the half-volume re-master lands at Hamming 0
    // of the original (the audio analog of the PNG↔JPEG pairing)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def fp(bytes: Array[Byte]): Long =
      Seq((1L, bytes)).toDF("id", "media")
        .select(graft.functions.PhashNative.dhash56(
          graft.functions.PhashNative.imageGridOrRaw(col("media"))).as("f"))
        .head().getLong(0)
    val direct =
      Seq((1L, env)).toDF("id", "media")
        .select(graft.functions.PhashNative.dhash56(col("media")).as("f"))
        .head().getLong(0)
    assert(fp(mono) === direct)
    assert(fp(half) === fp(mono))
    // a reversed-envelope signal (loud → quiet) must not collide
    val rev = wav(Array.tabulate(cells)(f => amp(f, 100)).reverse, 1)
    assert(java.lang.Long.bitCount(fp(rev) ^ fp(mono)) > 7)
  }

  test("phash pairs match re-encoded real images across formats") {
    import spark.implicits._
    import graft.operators.Multimodal
    // the same smooth gradient scene written as PNG and as JPEG (lossy,
    // different container bytes entirely) must land within the Hamming
    // gate; a reversed-gradient scene must not pair with either
    def scene(rev: Boolean): java.awt.image.BufferedImage = {
      val im = new java.awt.image.BufferedImage(36, 28,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 36; y <- 0 until 28) {
        val t = if (rev) 35 - x else x
        val v = 40 + t * 5
        im.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      im
    }
    def enc(im: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, fmt, bos)
      bos.toByteArray
    }
    val df = Seq(
      (1L, enc(scene(false), "png")),
      (2L, enc(scene(false), "jpg")),
      (3L, enc(scene(true), "png"))).toDF("id", "media")
    val pairs = Multimodal.phashPairs(df, "id", "media", maxHamming = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("native dhash56 rejects non-binary input at analysis time") {
    import spark.implicits._
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1L, "not bytes")).toDF("id", "media")
        .select(graft.functions.PhashNative.dhash56(col("id")).as("f"))
        .head()
    }
    assert(e.getMessage.toLowerCase.contains("binary"))
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

  // ---- real GIF frame decode ------------------------------------------------

  /** A flat-shaded scene (few distinct colors, so the GIF palette
    * quantization is lossless and the decode is pixel-exact). */
  private def gifScene(rev: Boolean): java.awt.image.BufferedImage = {
    val im = new java.awt.image.BufferedImage(36, 28,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 36; y <- 0 until 28) {
      val t = if (rev) 35 - x else x
      val v = 40 + (t / 4) * 20 // 9 gray levels: well under the palette
      im.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    im
  }

  /** Encode frames as one animated GIF via the JDK sequence writer. */
  private def animatedGif(
      frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach(f => writer.writeToSequence(
      new javax.imageio.IIOImage(f, null, null), null))
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  test("decodeGifFrames: two stored frames, bounded, non-GIF -> None") {
    val gif = animatedGif(Seq(gifScene(false), gifScene(true)))
    assert(Multimodal.sniffFormat(gif) === "gif")
    val frames = MediaCodec.decodeGifFrames(gif, 32).get
    assert(frames.length === 2)
    // each frame's grid must equal the SAME scene decoded standalone
    // (palette round-trip is lossless on the flat-shaded scene)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(gifScene(false), "gif", bos)
    val still = MediaCodec.decodeImageGrid(bos.toByteArray).get
    assert(frames.head.toSeq === still.toSeq)
    assert(frames.head.toSeq !== frames(1).toSeq)
    // maxFrames bound
    assert(MediaCodec.decodeGifFrames(gif, 1).get.length === 1)
    // non-GIF payloads decode no frames
    assert(MediaCodec.decodeGifFrames("plain text".getBytes, 32).isEmpty)
  }

  test("videoFrameDupPairs: shared frame across GIFs pairs, others don't") {
    import spark.implicits._
    // the SHARED frame must carry gradient bits (a monotone gradient
    // dHashes to 0 and the flood guard drops it — by design): use the
    // stripe scene as the shared raster. A = [stripes, rev-gradient],
    // B = [fwd-gradient, stripes]: expect exactly (A,0) ~ (B,1).
    val stripes = {
      val im = new java.awt.image.BufferedImage(36, 28,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 36; y <- 0 until 28)
        im.setRGB(x, y, if (x % 8 < 4) 0x202020 else 0xe0e0e0)
      im
    }
    val a = animatedGif(Seq(stripes, gifScene(true)))
    val b = animatedGif(Seq(gifScene(false), stripes))
    val df = Seq((1L, a), (2L, b), (3L, "not a gif".getBytes)).toDF("id", "media")
    val ph = Multimodal.videoFramePhashes(df, "id", "media")
    val rows = ph.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.keySet === Set((1L, 0L), (1L, 1L), (2L, 0L), (2L, 1L)))
    assert(rows((1L, 0L)) === rows((2L, 1L))) // identical stored frame
    assert(rows((1L, 0L)) !== 0L)
    // the monotone forward gradient carries no gradient bits -> 0 -> the
    // guard keeps it out of the pair join
    assert(rows((2L, 0L)) === 0L)
    val pairs = Multimodal.videoFrameDupPairs(df, "id", "media",
        maxHamming = 0)
      .select("id_a", "frame_a", "id_b", "frame_b")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(pairs === Set((1L, 0L, 2L, 1L)))
  }

  // ---- real MJPEG-in-AVI frame decode ---------------------------------------

  private def jpegBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** RIFF chunk: fourcc + LE u32 size + data (+ pad byte to word-align). */
  private def riffChunk(id: String, data: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer
      .allocate(8 + data.length + (data.length & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(id.getBytes("US-ASCII")).putInt(data.length).put(data)
    bb.array()
  }
  private def riffList(typ: String, payload: Array[Byte]): Array[Byte] =
    riffChunk("LIST", typ.getBytes("US-ASCII") ++ payload)

  /** Minimal MJPEG AVI: RIFF('AVI ', dummy hdrl, LIST movi(frames)).
    * `recWrap` puts each frame inside a LIST 'rec ' interleave group. */
  private def mjpegAvi(frames: Seq[Array[Byte]],
      recWrap: Boolean = false): Array[Byte] = {
    val movi = frames.zipWithIndex.flatMap { case (f, i) =>
      val c = riffChunk(f"$i%02ddc", f)
      (if (recWrap) riffList("rec ", c) else c).toSeq
    }.toArray
    riffChunk("RIFF",
      "AVI ".getBytes("US-ASCII") ++
        riffList("hdrl", riffChunk("avih", new Array[Byte](56))) ++
        riffList("movi", movi))
  }

  test("decodeAviFrames: MJPEG frames = standalone JPEG grids; WAV/none -> None") {
    val f0 = jpegBytes(gifScene(false))
    val f1 = jpegBytes(gifScene(true))
    val avi = mjpegAvi(Seq(f0, f1))
    assert(Multimodal.sniffFormat(avi) === "riff")
    val frames = MediaCodec.decodeAviFrames(avi, 32).get
    assert(frames.length === 2)
    // MJPEG = concatenated independent JPEGs: each frame grid must equal
    // the SAME JPEG payload decoded through the still-image path
    assert(frames(0).toSeq === MediaCodec.decodeImageGrid(f0).get.toSeq)
    assert(frames(1).toSeq === MediaCodec.decodeImageGrid(f1).get.toSeq)
    // maxFrames bound + rec-interleaved layout
    assert(MediaCodec.decodeAviFrames(avi, 1).get.length === 1)
    val rec = mjpegAvi(Seq(f0, f1), recWrap = true)
    assert(MediaCodec.decodeAviFrames(rec, 32).get.length === 2)
    // a WAV is RIFF but not AVI; a frameless AVI decodes nothing
    assert(MediaCodec.decodeAviFrames(wav, 32).isEmpty)
    assert(MediaCodec.decodeAviFrames(mjpegAvi(Seq.empty), 32).isEmpty)
    // a damaged frame is skipped, not fatal (the MJPEG independence
    // property): frame 0 truncated mid-scan, frame 1 still decodes
    val broken = mjpegAvi(Seq(f0.take(f0.length / 2), f1))
    assert(MediaCodec.decodeAviFrames(broken, 32).get.length === 1)
  }

  test("videoFramePhashes: GIF and MJPEG-AVI payloads hash through one path") {
    import spark.implicits._
    val gif = animatedGif(Seq(gifScene(false), gifScene(true)))
    val avi = mjpegAvi(Seq(jpegBytes(gifScene(false))))
    val df = Seq((1L, gif), (2L, avi), (3L, "neither".getBytes))
      .toDF("id", "media")
    val rows = Multimodal.videoFramePhashes(df, "id", "media")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.keySet === Set((1L, 0L), (1L, 1L), (2L, 0L)))
    // the AVI frame is the same scene as GIF frame 0: JPEG is lossy so
    // grids may differ slightly, but the dHash of the flat-shaded scene
    // must land within a small Hamming radius of the lossless GIF's
    val ham = java.lang.Long.bitCount(rows((1L, 0L)) ^ rows((2L, 0L)))
    assert(ham <= 6, s"gif-vs-mjpeg hamming $ham")
  }
}
