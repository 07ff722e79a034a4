package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{FlacCodec, MediaCodec}

/** FLAC codec: encoder→decoder round trips (sync walk, CRC-8/16, CONSTANT
  * / VERBATIM / rice-FIXED subframes, multi-frame streams with a partial
  * tail), hand-built bitstreams for the decoder-only paths (LPC,
  * left/side, right/side, mid/side), the WAV re-emission contract, and
  * malformed-input degradation. */
class FlacCodecSpec extends AnyFunSuite {

  /** Test-local bit writer for hand-built frames (MSB first, like the
    * codec's own). */
  private final class BW {
    val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nb += 1
      if (nb == 8) { buf.write(cur); cur = 0; nb = 0 }
    }
    def bits(v: Long, n: Int): Unit =
      (n - 1 to 0 by -1).foreach(i => bit(((v >>> i) & 1L).toInt))
    def rice(x: Int, k: Int): Unit = {
      val u = if (x >= 0) x.toLong << 1 else ((-x.toLong) << 1) - 1
      (0 until (u >>> k).toInt).foreach(_ => bit(0)); bit(1)
      bits(u & ((1L << k) - 1), k)
    }
    def align(): Unit = while (nb != 0) bit(0)
    def bytes: Array[Byte] = { align(); buf.toByteArray }
  }

  /** fLaC magic + STREAMINFO for `channels`, cribbed from the encoder's
    * own header (first 42 bytes of any encoded stream). */
  private def header(channels: Int): Array[Byte] =
    FlacCodec.encodeFlac(new Array[Int](16 * channels), channels, 8000, 16)
      .take(42)

  /** Frame header bits for a hand-built frame (16-bit block size at end,
    * rate from STREAMINFO, frame number 0), CRC-8 appended. */
  private def frameHeader(chCode: Int, blockSize: Int): Array[Byte] = {
    val w = new BW
    w.bits(0x3ffe, 14); w.bit(0); w.bit(0)
    w.bits(7, 4); w.bits(0, 4); w.bits(chCode.toLong, 4); w.bits(4, 3)
    w.bit(0)
    w.bits(0, 8)                  // utf-8 frame number 0
    w.bits((blockSize - 1).toLong, 16)
    val hb = w.bytes
    hb :+ FlacCodec.crc8(hb, 0, hb.length).toByte
  }

  private def withCrc16(stream: Array[Byte], frameStart: Int): Array[Byte] = {
    val crc = FlacCodec.crc16(stream, frameStart, stream.length)
    stream ++ Array(((crc >> 8) & 0xff).toByte, (crc & 0xff).toByte)
  }

  // ---- encoder→decoder round trips --------------------------------------

  test("roundtrip: mono pseudo-random stream, multi-frame with partial tail") {
    val samples = Array.tabulate(1200)(i =>
      (((i.toLong * 2654435761L) % 60001L) - 30000L).toInt)
    val enc = FlacCodec.encodeFlac(samples, 1, 8000, 256)
    val dec = FlacCodec.decodeFlacSamples(enc).get
    assert(dec.channels === 1)
    assert(dec.bps === 16)
    assert(dec.sampleRate === 8000)
    assert(dec.samples.toSeq === samples.toSeq)
  }

  test("roundtrip: stereo interleave, constant left + ramp right") {
    val samples = Array.tabulate(400)(i =>
      if (i % 2 == 0) 5000 else (i / 2) * 7 - 600)
    val enc = FlacCodec.encodeFlac(samples, 2, 44100, 64)
    val dec = FlacCodec.decodeFlacSamples(enc).get
    assert(dec.channels === 2)
    assert(dec.samples.toSeq === samples.toSeq)
  }

  test("roundtrip: rice-coded FIXED beats VERBATIM on a smooth ramp") {
    val ramp = Array.tabulate(512)(i => i * 13 - 3000)
    val enc = FlacCodec.encodeFlac(ramp, 1, 8000, 512)
    // order-2 residuals are all zero after warmup: far below raw size
    assert(enc.length < 42 + 512 * 2 / 4)
    assert(FlacCodec.decodeFlacSamples(enc).get.samples.toSeq === ramp.toSeq)
  }

  test("roundtrip: incompressible alternation falls back to VERBATIM") {
    val alt = Array.tabulate(128)(i => if (i % 2 == 0) 32767 else -32768)
    val enc = FlacCodec.encodeFlac(alt, 1, 8000, 128)
    assert(FlacCodec.decodeFlacSamples(enc).get.samples.toSeq === alt.toSeq)
  }

  test("roundtrip: silence collapses to CONSTANT subframes") {
    val enc = FlacCodec.encodeFlac(new Array[Int](2048), 1, 8000, 1024)
    assert(enc.length <= 42 + 28) // two ~13-byte frames: hdr+constant+crc
    val dec = FlacCodec.decodeFlacSamples(enc).get
    assert(dec.samples.length === 2048)
    assert(dec.samples.forall(_ == 0))
  }

  // ---- hand-built decoder-only paths ------------------------------------

  test("LPC subframe: order-1 coef=1 shift=0 integrates rice residuals") {
    val w = new BW
    w.bit(0); w.bits(0x20, 6); w.bit(0) // LPC order 1, no wasted bits
    w.bits(100L & 0xffff, 16)           // warmup v0 = 100
    w.bits(14, 4)                       // precision-1 -> 15 bits
    w.bits(0, 5)                        // shift 0
    w.bits(1L & 0x7fff, 15)             // coef = 1
    w.bits(0, 2); w.bits(0, 4); w.bits(2, 4) // method 0, porder 0, k=2
    Seq(5, -3, 2).foreach(r => w.rice(r, 2))
    val hdr = header(1)
    val fh = frameHeader(chCode = 0, blockSize = 4)
    val stream = withCrc16(hdr ++ fh ++ w.bytes, hdr.length)
    val dec = FlacCodec.decodeFlacSamples(stream).get
    assert(dec.samples.toSeq === Seq(100, 105, 102, 104))
  }

  test("left/side decorrelation: right = left - side (17-bit side)") {
    val w = new BW
    w.bit(0); w.bits(1, 6); w.bit(0)    // ch0 VERBATIM, 16 bps (left)
    Seq(100, 200).foreach(v => w.bits(v.toLong & 0xffff, 16))
    w.bit(0); w.bits(1, 6); w.bit(0)    // ch1 VERBATIM, 17 bps (side)
    Seq(40, 50).foreach(v => w.bits(v.toLong & 0x1ffff, 17))
    val hdr = header(2)
    val fh = frameHeader(chCode = 8, blockSize = 2)
    val stream = withCrc16(hdr ++ fh ++ w.bytes, hdr.length)
    val dec = FlacCodec.decodeFlacSamples(stream).get
    assert(dec.samples.toSeq === Seq(100, 60, 200, 150))
  }

  test("right/side decorrelation: left = right + side") {
    val w = new BW
    w.bit(0); w.bits(1, 6); w.bit(0)    // ch0 VERBATIM, 17 bps (side)
    Seq(5).foreach(v => w.bits(v.toLong & 0x1ffff, 17))
    w.bit(0); w.bits(1, 6); w.bit(0)    // ch1 VERBATIM, 16 bps (right)
    Seq(10).foreach(v => w.bits(v.toLong & 0xffff, 16))
    val hdr = header(2)
    val fh = frameHeader(chCode = 9, blockSize = 1)
    val stream = withCrc16(hdr ++ fh ++ w.bytes, hdr.length)
    assert(FlacCodec.decodeFlacSamples(stream).get.samples.toSeq === Seq(15, 10))
  }

  test("mid/side decorrelation: floor-mid plus side LSB reconstructs") {
    // L = [7, -8], R = [4, -3] -> side = [3, -5], mid = [5, -6]
    val w = new BW
    w.bit(0); w.bits(1, 6); w.bit(0)    // ch0 VERBATIM, 16 bps (mid)
    Seq(5, -6).foreach(v => w.bits(v.toLong & 0xffff, 16))
    w.bit(0); w.bits(1, 6); w.bit(0)    // ch1 VERBATIM, 17 bps (side)
    Seq(3, -5).foreach(v => w.bits(v.toLong & 0x1ffff, 17))
    val hdr = header(2)
    val fh = frameHeader(chCode = 10, blockSize = 2)
    val stream = withCrc16(hdr ++ fh ++ w.bytes, hdr.length)
    assert(FlacCodec.decodeFlacSamples(stream).get.samples.toSeq ===
      Seq(7, 4, -8, -3))
  }

  // ---- WAV re-emission + stats gate -------------------------------------

  test("flacToWav: decoded FLAC feeds the WAV stats gate, hand-checked") {
    val samples = Array(0, 1000, -1000, 400, 30000)
    val enc = FlacCodec.encodeFlac(samples ++ new Array[Int](11), 1, 8000, 16)
    // stats over 16 frames: the 11 zero-pads add silence only
    val st = MediaCodec.decodeAudioStats(enc).get
    assert(st(0) === 16L)            // n_frames
    assert(st(1) === 1L)             // channels
    assert(st(2) === 32400L)         // sum_abs
    assert(st(3) === 902160000L)     // sum_sq
    assert(st(4) === 30000L)         // max_abs
    assert(st(5) === 2L)             // zero crossings (1000/-1000, -1000/400)
    assert(st(6) === 12L)            // silence: the 0 + 11 pads
    assert(st(7) === 1L)             // clip: the 30000
  }

  test("decodeAudioStats: WAV payloads take the WAV path unchanged") {
    val samples = Array(0, 1000, -1000, 400, 30000)
    val flac = FlacCodec.encodeFlac(samples, 1, 8000, 16)
    val wav = FlacCodec.flacToWav(flac).get
    assert(MediaCodec.decodeAudioStats(wav).get.toSeq ===
      MediaCodec.decodeWavStats(wav).get.toSeq)
  }

  test("FLAC and WAV carriers of one signal share one envelope; gain cancels") {
    val samples = Array.tabulate(63)(i => (3 * 53 + i * 997) % 3001 - 1500)
    val flac = FlacCodec.encodeFlac(samples, 1, 8000, 16)
    val wav = FlacCodec.flacToWav(flac).get
    assert(MediaCodec.decodeAudioEnvelope(flac).get.toSeq ===
      MediaCodec.decodeWavEnvelope(wav).get.toSeq)
    // x16 amplification cancels exactly in the integer normalization
    val flac16 = FlacCodec.encodeFlac(samples.map(_ * 16), 1, 8000, 16)
    assert(MediaCodec.decodeAudioEnvelope(flac16).get.toSeq ===
      MediaCodec.decodeAudioEnvelope(flac).get.toSeq)
  }

  // ---- malformed inputs ---------------------------------------------------

  test("malformed: non-FLAC, truncated, and bit-flipped streams -> None") {
    val good = FlacCodec.encodeFlac(Array.tabulate(64)(i => i * 31), 1, 8000, 64)
    assert(FlacCodec.decodeFlacSamples("not a flac".getBytes).isEmpty)
    assert(FlacCodec.decodeFlacSamples(good.dropRight(3)).isEmpty)
    val corrupt = good.clone()
    corrupt(corrupt.length - 5) = (corrupt(corrupt.length - 5) ^ 0x10).toByte
    assert(FlacCodec.decodeFlacSamples(corrupt).isEmpty) // CRC-16 catches it
    assert(MediaCodec.decodeAudioStats("RIFFjunk".getBytes).isEmpty)
  }

  test("trailing bytes after the last frame (ID3v1-style tag) are tolerated") {
    val samples = Array.tabulate(64)(i => i * 31)
    val good = FlacCodec.encodeFlac(samples, 1, 8000, 64)
    val tag = ("TAG" + "x" * 125).getBytes("US-ASCII") // 128-byte ID3v1 shape
    val tagged = good ++ tag
    val dec = FlacCodec.decodeFlacSamples(tagged)
    assert(dec.isDefined)
    assert(dec.get.samples.toSeq === FlacCodec.decodeFlacSamples(good).get.samples.toSeq)
  }

  test("encodeFlac rejects out-of-range samples and sample rates loudly") {
    intercept[IllegalArgumentException] {
      FlacCodec.encodeFlac(Array(0, 40000), 1, 8000, 16) // > 16-bit
    }
    intercept[IllegalArgumentException] {
      FlacCodec.encodeFlac(Array(0, -32769), 1, 8000, 16)
    }
    intercept[IllegalArgumentException] {
      FlacCodec.encodeFlac(Array.fill(16)(1), 1, 1 << 20, 16) // 20-bit rate field
    }
  }
}
