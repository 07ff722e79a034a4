package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CompandedWav, MediaCodec}

/** G.711 (µ-law/A-law) and IMA-ADPCM doors: expansion tables anchored
  * against the CPython `audioop` reference values, hand-walked IMA state
  * updates, container round-trips through the MediaCodec orElse chain,
  * and malformed-input behavior. */
class CompandedWavSpec extends AnyFunSuite {

  /** PCM16 samples out of a canonical PCM16 WAV (the decoder's output
    * contract: 44-byte header, s16le data). */
  private def pcmSamples(wav: Array[Byte]): Seq[Int] =
    (44 until wav.length by 2).map(o =>
      ((wav(o) & 0xff) | (wav(o + 1) << 8)).toShort.toInt)

  // ---- G.711 expansion tables ---------------------------------------------

  test("ulaw2linear matches the audioop reference at anchor bytes") {
    val anchors = Seq(0 -> -32124, 1 -> -31100, 15 -> -16764,
      16 -> -15996, 31 -> -8316, 63 -> -1980, 100 -> -308, 127 -> 0,
      128 -> 32124, 129 -> 31100, 200 -> 1372, 254 -> 8, 255 -> 0)
    anchors.foreach { case (b, want) =>
      assert(CompandedWav.ulaw2linear(b) === want, s"byte $b")
    }
  }

  test("alaw2linear matches the audioop reference at anchor bytes") {
    val anchors = Seq(0 -> -5504, 1 -> -5248, 15 -> -6784, 16 -> -2752,
      31 -> -3392, 63 -> -13568, 100 -> -1120, 127 -> -848, 128 -> 5504,
      129 -> 5248, 200 -> 472, 254 -> 880, 255 -> 848)
    anchors.foreach { case (b, want) =>
      assert(CompandedWav.alaw2linear(b) === want, s"byte $b")
    }
  }

  test("G.711 compress-expand is idempotent and sign-symmetric") {
    val sweep = (-32768 to 32767 by 97) ++ Seq(-32768, -1, 0, 1, 32767)
    sweep.foreach { s =>
      val ub = CompandedWav.linear2ulaw(s)
      val uq = CompandedWav.ulaw2linear(ub)
      // re-encoding the quantized VALUE must quantize to itself (byte
      // equality would fail only at G.711's dual zero: 0x7f and 0xff
      // both decode to 0)
      assert(CompandedWav.ulaw2linear(CompandedWav.linear2ulaw(uq)) === uq,
        s"ulaw s=$s")
      val ab = CompandedWav.linear2alaw(s)
      val aq = CompandedWav.alaw2linear(ab)
      assert(CompandedWav.alaw2linear(CompandedWav.linear2alaw(aq)) === aq,
        s"alaw s=$s")
      // quantization error bounded by the segment width
      assert(math.abs(uq - s) <= 1024, s"ulaw err s=$s got $uq")
      assert(math.abs(aq - s) <= 1024, s"alaw err s=$s got $aq")
    }
  }

  // ---- IMA step walk ------------------------------------------------------

  test("imaStep hand-walk: nibbles [4,8,15,3,0,0,0,0] from (0,0)") {
    // step-by-step: n=4 -> pred 7, idx 2; n=8 (step 9) -> 6, 1;
    // n=15 (step 8, diff 1+2+4+8) -> -9, 9; n=3 (step 17, diff 2+4+8)
    // -> 5, 8; then four 0-nibbles (steps 16,14,13,12, diff step/8)
    // -> 7,8,9,10 at idx 7,6,5,4.
    val wav = CompandedWav.imaWavFromNibbles(0, 0,
      Array(4, 8, 15, 3, 0, 0, 0, 0), 8000)
    val got = CompandedWav.toPcm16Wav(wav).map(pcmSamples)
    assert(got === Some(Seq(0, 7, 6, -9, 5, 7, 8, 9, 10)))
  }

  test("imaStep clamps predictor and index at the rails") {
    // predictor clamp: from 32767 with a large positive diff
    val (pHi, _) = CompandedWav.imaStep(32767, 88, 7)
    assert(pHi === 32767)
    val (pLo, _) = CompandedWav.imaStep(-32768, 88, 15)
    assert(pLo === -32768)
    // index clamp at both ends
    assert(CompandedWav.imaStep(0, 0, 0)._2 === 0)
    assert(CompandedWav.imaStep(0, 88, 7)._2 === 88)
  }

  test("encodeImaWav round-trip tracks the source within step resolution") {
    val src = Array.tabulate(257)(i =>
      (math.sin(i / 9.0) * 12000).toInt)
    val wav = CompandedWav.encodeImaWav(src, 8000)
    val got = CompandedWav.toPcm16Wav(wav).map(pcmSamples).get
    assert(got.length === src.length)
    assert(got.head === src.head) // header sample is verbatim
    // ADPCM tracks a smooth signal closely once the step adapts
    val err = src.toSeq.zip(got).drop(32).map(t => math.abs(t._1 - t._2))
    assert(err.max <= 2000, s"max err ${err.max}")
  }

  // ---- container + orElse chain -------------------------------------------

  test("mu-law WAV rides the MediaCodec stats door") {
    val bytes = Array.tabulate(400)(i => (i % 256).toByte)
    val wav = CompandedWav.g711WavFromBytes(bytes, 1, 8000, aLaw = false)
    val viaChain = MediaCodec.decodeAudioStats(wav)
    assert(viaChain.isDefined)
    val expanded = bytes.map(b => CompandedWav.ulaw2linear(b & 0xff))
    assert(viaChain.get(0) === 400L) // n_frames
    assert(viaChain.get(1) === 1L)   // channels
    assert(viaChain.get(2) === expanded.map(v => math.abs(v.toLong)).sum)
    assert(viaChain.get(4) === expanded.map(v => math.abs(v.toLong)).max)
  }

  test("A-law stereo WAV folds channels like the PCM door") {
    val bytes = Array.tabulate(64)(i => ((i * 37) % 256).toByte)
    val wav = CompandedWav.g711WavFromBytes(bytes, 2, 8000, aLaw = true)
    val st = MediaCodec.decodeAudioStats(wav)
    assert(st.isDefined)
    assert(st.get(0) === 32L)
    assert(st.get(1) === 2L)
  }

  test("ADPCM WAV rides the envelope door and matches its PCM16 twin") {
    val src = Array.tabulate(256)(i => (math.sin(i / 5.0) * 8000).toInt)
    val wav = CompandedWav.encodeImaWav(src, 8000)
    val env = MediaCodec.decodeAudioEnvelope(wav)
    assert(env.isDefined)
    val pcm = CompandedWav.toPcm16Wav(wav).get
    assert(env.get.toSeq === MediaCodec.decodeWavEnvelope(pcm).get.toSeq)
  }

  // ---- MS ADPCM (tag 2) ---------------------------------------------------

  /** Raw RIFF builder for formats wavContainer doesn't construct in the
    * needed shape (no fact chunk, multi-channel). */
  private def rawWav(tag: Int, channels: Int, blockAlign: Int, bits: Int,
      payload: Array[Byte]): Array[Byte] = {
    val total = 4 + (8 + 16) + (8 + payload.length)
    val out = new Array[Byte](8 + total)
    def w32(o: Int, v: Long): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte
      out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    def w16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def tg(o: Int, s: String): Unit =
      (0 until 4).foreach(i => out(o + i) = s.charAt(i).toByte)
    tg(0, "RIFF"); w32(4, total.toLong); tg(8, "WAVE")
    tg(12, "fmt "); w32(16, 16L); w16(20, tag); w16(22, channels)
    w32(24, 8000L); w32(28, 8000L); w16(32, blockAlign); w16(34, bits)
    tg(36, "data"); w32(40, payload.length.toLong)
    System.arraycopy(payload, 0, out, 44, payload.length)
    out
  }

  test("msStep hand-walk: prediction, clamps, truncating division") {
    // coef (256,0): pb = s1; nib 3 scales delta up from the 16 floor
    assert(CompandedWav.msStep(100, 50, 16, 256, 0, 3) === (148, 100, 16))
    // nib 9 = -7; delta adapts 614*16/256 = 38
    assert(CompandedWav.msStep(148, 100, 16, 256, 0, 9) === (36, 148, 38))
    // truncation TOWARD ZERO: 1*460 + 3*(-208) = -164 -> pb = 0 (floor
    // division would give -1 and drift the whole downstream walk)
    assert(CompandedWav.msStep(1, 3, 16, 460, -208, 0) === (0, 1, 16))
    // predictor rails and the delta ceiling
    assert(CompandedWav.msStep(32767, 32767, 32767, 512, -256, 7) ===
      (32767, 32767, 32767))
    assert(CompandedWav.msStep(-32768, 0, 32767, 256, 0, 8)._1 === -32768)
  }

  test("msWavFromNibbles decodes sample2, sample1, then the nibble walk") {
    val wav = CompandedWav.msWavFromNibbles(0, 16, 100, 50,
      Array(3, 9), 8000)
    assert(CompandedWav.toPcm16Wav(wav).map(pcmSamples) ===
      Some(Seq(50, 100, 148, 36)))
    // the truncating-division case end-to-end (coef pair 460/-208)
    val wav2 = CompandedWav.msWavFromNibbles(5, 16, 1, 3, Array(0, 0), 8000)
    assert(CompandedWav.toPcm16Wav(wav2).map(pcmSamples) ===
      Some(Seq(3, 1, 0, 0)))
  }

  test("MS-ADPCM stereo: per-channel headers, nibbles rotate channels") {
    // ch0 pred-class 0 (256,0) delta 16 s1 100 s2 50;
    // ch1 pred-class 2 (0,0)  delta 20 s1 200 s2 150
    val payload = Array[Int](
      0, 2, 16, 0, 20, 0, 100, 0, 200, 0, 50, 0, 150, 0,
      0x31, 0x9f).map(_.toByte)
    val wav = rawWav(2, 2, 16, 4, payload)
    // nibbles (high first): 3 -> ch0, 1 -> ch1, 9 -> ch0, 15 -> ch1
    // ch0: as the mono hand-walk (148 then 36)
    // ch1: pb = 0 always; +1*20 = 20 (delta -> 17); then -1*17 = -17
    assert(CompandedWav.toPcm16Wav(wav).map(pcmSamples) ===
      Some(Seq(50, 150, 100, 200, 148, 20, 36, -17)))
  }

  test("MS-ADPCM unknown predictor class degrades to None") {
    val wav = CompandedWav.msWavFromNibbles(0, 16, 0, 0, Array(0, 0), 8000)
    val dataStart = 12 + 8 + 18 + 8 + 4 + 8 // riff+fmt+fact+data hdr
    wav(dataStart) = 7 // only classes 0..6 exist
    assert(CompandedWav.toPcm16Wav(wav).isEmpty)
  }

  test("IMA stereo partial final rotation flushes the decoded channels") {
    // c=2, blockAlign 20: header 8 B + 12 data B = 3 groups — ch0, ch1,
    // ch0 again. The trailing odd group must flush its 8 ch0 samples
    // (all-zero nibbles keep each channel's predictor flat).
    val payload = new Array[Byte](20)
    payload(4) = 0xe8.toByte; payload(5) = 0x03 // ch1 pred = 1000
    val wav = rawWav(17, 2, 20, 4, payload)
    val got = CompandedWav.toPcm16Wav(wav).map(pcmSamples)
    val interleaved = (0 until 8).flatMap(_ => Seq(0, 1000))
    assert(got === Some(Seq(0, 1000) ++ interleaved ++ Seq.fill(8)(0)))
  }

  test("malformed companded payloads degrade to None") {
    assert(CompandedWav.toPcm16Wav("not a wav".getBytes).isEmpty)
    assert(CompandedWav.toPcm16Wav(null).isEmpty)
    // PCM WAV (tag 1) is NOT this door's format
    val pcm = CompandedWav.toPcm16Wav(
      CompandedWav.toPcm16Wav(CompandedWav.g711WavFromBytes(
        Array.fill(16)(0x40.toByte), 1, 8000, aLaw = false)).get)
    assert(pcm.isEmpty)
    // non-zero reserved byte in an ADPCM block header
    val adpcm = CompandedWav.imaWavFromNibbles(0, 0,
      Array(0, 0, 0, 0, 0, 0, 0, 0), 8000)
    val dataStart = 12 + 8 + 18 + 8 + 4 + 8 // riff+fmt+fact+data hdr
    adpcm(dataStart + 3) = 1
    assert(CompandedWav.toPcm16Wav(adpcm).isEmpty)
  }
}
