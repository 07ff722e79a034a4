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
