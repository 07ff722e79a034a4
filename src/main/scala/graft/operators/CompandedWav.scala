package graft.operators

/** Companded / block-compressed WAV decode — the compressed-audio doors
  * next to [[FlacCodec]]: G.711 µ-law (WAV format tag 7) and A-law
  * (tag 6) companding, IMA/DVI ADPCM (tag 17), and MS-ADPCM (tag 2).
  * Like the FLAC door, every decoder re-emits canonical PCM16 WAV so the
  * whole audio operator family (stats, perceptual envelope, dedup,
  * streaming gate) takes these containers through one `orElse` in
  * `MediaCodec.decodeAudioStats` / `decodeAudioEnvelope`.
  *
  * All four codecs are fully spec-bounded (no entropy coding, no
  * inter-frame prediction): the G.711 expansions are the classic CCITT
  * segment tables (the Sun `g711.c` reference arithmetic, public since
  * the 80s), IMA ADPCM is the 89-entry step table + 3-bit index walk of
  * the IMA/DVI spec, and MS-ADPCM is the 7-coefficient linear predictor
  * + 16-entry delta adaptation of the public RIFF spec — so, unlike the
  * H.264/VP9/AV1 seam, these are honestly reimplementable and now
  * implemented.
  *
  * Encoders exist for constructed test payloads (spec round-trips and
  * the mm_* oracle queries). The decode map and the ADPCM state walk are
  * each mirrored closed-form in the DuckDB oracles, so a table error or
  * clamp drift breaks the correctness hash, not just a unit test.
  *
  * Reference behavior mirrored from the public specs only; the reference
  * repo (a Singer→parquet loader, `/root/reference/target_hdfs`) has no
  * audio surface — this family is [ext] scope.
  */
object CompandedWav {

  // ------------------------------------------------------------- G.711

  /** µ-law byte → linear PCM16 (CCITT G.711, Sun g711.c arithmetic):
    * invert, then `t = ((mantissa·8) + 0x84) << exponent`, sign from the
    * top bit. Range ±32124. */
  def ulaw2linear(b: Int): Int = {
    val u = ~b & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 0x07)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** A-law byte → linear PCM16 (CCITT G.711): XOR 0x55, segment shift,
    * sign from the top bit. Range ±32256. */
  def alaw2linear(b: Int): Int = {
    val a = b ^ 0x55
    val seg = (a & 0x70) >> 4
    var t = (a & 0x0f) << 4
    if (seg == 0) t += 8
    else if (seg == 1) t += 0x108
    else { t += 0x108; t <<= seg - 1 }
    if ((a & 0x80) != 0) t else -t
  }

  private val SegEnd = Array(0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF,
    0x3FFF, 0x7FFF)

  /** Linear PCM16 → µ-law byte (the standard lossy compressor — used
    * only to construct test payloads; decode is the contract). */
  def linear2ulaw(sample: Int): Int = {
    var s = sample
    val sign = if (s < 0) { s = -s; 0x80 } else 0
    if (s > 32635) s = 32635
    s += 0x84
    var seg = 0
    while (seg < 8 && s > SegEnd(seg)) seg += 1
    if (seg >= 8) 0x7f ^ sign ^ 0xff
    else {
      val uval = (seg << 4) | ((s >> (seg + 3)) & 0x0f)
      (uval | sign) ^ 0xff
    }
  }

  /** Linear PCM16 → A-law byte. */
  def linear2alaw(sample: Int): Int = {
    var s = sample
    val sign = if (s >= 0) 0x80 else { s = -s - 1; 0 }
    if (s > 32767) s = 32767
    var seg = 0
    val probe = s >> 4 // A-law has no bias; segments over s/16
    var p = probe
    while (seg < 8 && p > 0x0f) { p >>= 1; seg += 1 }
    val aval =
      if (seg >= 8) 0x7f
      else if (seg == 0) (s >> 4) & 0x0f
      else (seg << 4) | ((s >> (seg + 3)) & 0x0f)
    (aval | sign) ^ 0x55
  }

  // --------------------------------------------------------- IMA ADPCM

  /** IMA/DVI step-size table (89 entries, the spec constants). */
  val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Index adjustment per nibble magnitude (sign bit excluded). */
  val IndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA decode step: (predictor, stepIndex) × nibble → updated
    * state. The diff expansion `step/8 + bits·(step, step/2, step/4)`
    * and both clamps are the spec walk, mirrored closed-form in the
    * mm_adpcm oracle's recursive CTE. */
  def imaStep(pred: Int, stepIdx: Int, nibble: Int): (Int, Int) = {
    val step = StepTable(stepIdx)
    var diff = step >> 3
    if ((nibble & 1) != 0) diff += step >> 2
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 4) != 0) diff += step
    val p =
      if ((nibble & 8) != 0) math.max(-32768, pred - diff)
      else math.min(32767, pred + diff)
    val i = math.min(88, math.max(0, stepIdx + IndexTable(nibble & 7)))
    (p, i)
  }

  // ---------------------------------------------------------- MS ADPCM

  /** MS-ADPCM canonical coefficient pairs (the 7 predictor classes every
    * known encoder writes into the fmt extension; the decoder validates
    * the block predictor index against this built-in set). */
  val MsCoefs: Array[(Int, Int)] = Array(
    (256, 0), (512, -256), (0, 0), (192, 64), (240, 0), (460, -208),
    (392, -232))

  /** MS-ADPCM adaptation table (16 entries, indexed by the UNSIGNED
    * nibble). */
  val MsAdaptTable: Array[Int] = Array(
    230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409, 307, 230,
    230, 230)

  /** C-style truncating division by 256 (toward zero — Scala's `/`;
    * mirrored in the oracle as `(a - (a % 256)) // 256`, exact because
    * DuckDB's `%` is C-signed and the adjusted numerator divides
    * evenly). */
  @inline private def div256(a: Int): Int = a / 256

  /** One MS-ADPCM decode step: state (sample1, sample2, delta) × nibble
    * → (predicted sample = new sample1, new sample2 = old sample1, new
    * delta). The spec walk: linear prediction from the coefficient pair,
    * signed-nibble scale by delta, PCM16 clamp, then delta adaptation
    * with the spec's 16 floor — plus a 32767 ceiling, since delta is an
    * s16 container quantity and an unbounded int (the ffmpeg behavior)
    * overflows on adversarial nibble streams real encoders never emit;
    * the clamp keeps the state machine total and exactly mirrorable. */
  def msStep(s1: Int, s2: Int, delta: Int, coef1: Int, coef2: Int,
      nibble: Int): (Int, Int, Int) = {
    val sn = if (nibble >= 8) nibble - 16 else nibble
    val pred0 = div256(s1 * coef1 + s2 * coef2) + sn * delta
    val pred = math.min(32767, math.max(-32768, pred0))
    val d = math.min(32767, math.max(16, div256(MsAdaptTable(nibble) * delta)))
    (pred, s1, d)
  }

  // ------------------------------------------------------ WAV plumbing

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private final case class Fmt(tag: Int, channels: Int, rate: Int,
    blockAlign: Int, bits: Int, dataOff: Int, dataLen: Int,
    factSamples: Long)

  /** RIFF walk shared by the three doors: same Long-cursor discipline as
    * `MediaCodec.decodeWavStats` (a malformed chunk size can't wrap the
    * cursor), honors the optional `fact` chunk (total samples per
    * channel — authoritative for block codecs whose last block is
    * partial). */
  private def parseWav(bytes: Array[Byte]): Option[Fmt] = {
    if (bytes == null || bytes.length < 20) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
        bytes(10) == 'V' && bytes(11) == 'E')) return None
    var off = 12L
    var tag = -1; var channels = 0; var rate = 0; var blockAlign = 0
    var bits = 0; var dataOff = -1; var dataLen = 0; var fact = -1L
    while (off + 8 <= bytes.length) {
      val o = off.toInt
      val t = new String(bytes.slice(o, o + 4), "US-ASCII")
      val sz = u32(bytes, o + 4)
      if (t == "fmt ") {
        if (sz < 16 || o + 8 + 16 > bytes.length) return None
        tag = u16(bytes, o + 8)
        channels = u16(bytes, o + 10)
        rate = u32(bytes, o + 12).toInt
        blockAlign = u16(bytes, o + 20)
        bits = u16(bytes, o + 22)
      } else if (t == "fact") {
        if (sz >= 4 && o + 12 <= bytes.length) fact = u32(bytes, o + 8)
      } else if (t == "data") {
        dataOff = o + 8
        dataLen = math.min(sz, (bytes.length - dataOff).toLong).toInt
      }
      off += 8L + sz + (sz & 1L)
    }
    if (tag < 0 || channels < 1 || dataOff < 0) None
    else Some(Fmt(tag, channels, rate, blockAlign, bits, dataOff, dataLen,
      fact))
  }

  /** Canonical PCM16 WAV writer (the `FlacCodec.flacToWav` output
    * contract). */
  private def pcm16Wav(samples: Array[Int], channels: Int,
      rate: Int): Array[Byte] = {
    val n = samples.length
    val data = new Array[Byte](44 + 2 * n)
    def w32(o: Int, v: Long): Unit = {
      data(o) = (v & 0xff).toByte; data(o + 1) = ((v >> 8) & 0xff).toByte
      data(o + 2) = ((v >> 16) & 0xff).toByte
      data(o + 3) = ((v >> 24) & 0xff).toByte
    }
    def w16(o: Int, v: Int): Unit = {
      data(o) = (v & 0xff).toByte; data(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def tg(o: Int, s: String): Unit =
      (0 until 4).foreach(i => data(o + i) = s.charAt(i).toByte)
    tg(0, "RIFF"); w32(4, 36L + 2 * n); tg(8, "WAVE")
    tg(12, "fmt "); w32(16, 16L); w16(20, 1); w16(22, channels)
    w32(24, rate.toLong); w32(28, rate.toLong * channels * 2)
    w16(32, channels * 2); w16(34, 16); tg(36, "data"); w32(40, 2L * n)
    var i = 0
    while (i < n) { w16(44 + 2 * i, samples(i) & 0xffff); i += 1 }
    data
  }

  // ------------------------------------------------------------ decode

  /** Decode a µ-law / A-law / IMA-ADPCM WAV to canonical PCM16 WAV;
    * None for anything else (PCM WAVs take their own door, everything
    * malformed degrades to the caller's byte-span path). */
  def toPcm16Wav(bytes: Array[Byte]): Option[Array[Byte]] = try {
    parseWav(bytes).flatMap { f =>
      f.tag match {
        case 6 | 7 =>
          if (f.bits != 8) None
          else {
            val n = f.dataLen
            if (n < 1) None
            else {
              val exp: Int => Int =
                if (f.tag == 7) ulaw2linear else alaw2linear
              val out = new Array[Int](n)
              var i = 0
              while (i < n) {
                out(i) = exp(bytes(f.dataOff + i) & 0xff); i += 1
              }
              Some(pcm16Wav(out, f.channels, f.rate))
            }
          }
        case 17 =>
          if (f.bits != 4 || f.blockAlign < 4 * f.channels) None
          else decodeImaData(bytes, f).map(pcm16Wav(_, f.channels, f.rate))
        case 2 =>
          if (f.bits != 4 || f.blockAlign < 7 * f.channels + 1) None
          else decodeMsData(bytes, f).map(pcm16Wav(_, f.channels, f.rate))
        case _ => None
      }
    }
  } catch { case scala.util.control.NonFatal(_) => None }

  /** IMA ADPCM block walk: per block, a 4-byte header per channel
    * (predictor s16le = the block's FIRST output sample, step index,
    * reserved), then the nibble data in 4-byte per-channel groups (low
    * nibble first). A partial final block decodes its available bytes;
    * a `fact` chunk, when present, truncates to the authoritative
    * per-channel sample count. */
  private def decodeImaData(bytes: Array[Byte], f: Fmt): Option[Array[Int]] = {
    val c = f.channels
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var blockStart = 0
    while (blockStart + 4 * c <= f.dataLen) {
      val blockLen = math.min(f.blockAlign, f.dataLen - blockStart)
      val base = f.dataOff + blockStart
      val pred = new Array[Int](c)
      val idx = new Array[Int](c)
      var ch = 0
      while (ch < c) {
        val o = base + 4 * ch
        pred(ch) = ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort.toInt
        idx(ch) = math.min(88, math.max(0, bytes(o + 2) & 0xff))
        if (bytes(o + 3) != 0) return None // reserved byte must be zero
        ch = ch + 1
      }
      // header predictors are the first frame
      var chh = 0
      while (chh < c) { out += pred(chh); chh += 1 }
      // nibble data: 4-byte groups per channel, channels rotating
      val dataBytes = blockLen - 4 * c
      val groups = dataBytes / 4
      val frame = new Array[Int](8 * c) // one group-round = 8 frames
      var g = 0
      while (g < groups) {
        val ch2 = (g % c).toInt
        val o = base + 4 * c + g * 4
        var b = 0
        while (b < 4) {
          val by = bytes(o + b) & 0xff
          val n0 = by & 0x0f
          val n1 = (by >> 4) & 0x0f
          val s0 = imaStep(pred(ch2), idx(ch2), n0)
          pred(ch2) = s0._1; idx(ch2) = s0._2
          frame((2 * b) * c + ch2) = s0._1
          val s1 = imaStep(pred(ch2), idx(ch2), n1)
          pred(ch2) = s1._1; idx(ch2) = s1._2
          frame((2 * b + 1) * c + ch2) = s1._1
          b += 1
        }
        // a full rotation of channels fills 8 interleaved frames
        if (ch2 == c - 1) {
          var k = 0
          while (k < 8 * c) { out += frame(k); k += 1 }
        }
        g += 1
      }
      // Truncated final rotation (groups % c != 0 — only possible when
      // c > 1, on a short final block): flush just the channels that
      // decoded, frame-major, so their samples aren't silently dropped.
      // The interleave collapses to the populated channels at stream
      // end; leftover (<4) bytes in a partial block are padding.
      val rem = groups % c
      if (rem != 0) {
        var k = 0
        while (k < 8) {
          var ch3 = 0
          while (ch3 < rem) { out += frame(k * c + ch3); ch3 += 1 }
          k += 1
        }
      }
      blockStart += f.blockAlign
    }
    if (out.isEmpty) None
    else {
      val limit =
        if (f.factSamples >= 0) math.min(out.length.toLong,
          f.factSamples * c).toInt
        else out.length
      Some(out.take(limit).toArray)
    }
  }

  /** MS-ADPCM block walk (WAV format tag 2): per block, a per-channel
    * header — 1 byte predictor-class index (validated against
    * [[MsCoefs]]), s16le initial delta, s16le sample1, s16le sample2 —
    * then 4-bit codes packed HIGH NIBBLE FIRST (the opposite of IMA),
    * channels rotating per nibble. Each block emits sample2 first, then
    * sample1, then the decoded stream (so every nibble is one complete
    * interleaved sample — no frame buffering, and a truncated block
    * loses nothing). A `fact` chunk truncates to the authoritative
    * per-channel count. */
  private def decodeMsData(bytes: Array[Byte], f: Fmt): Option[Array[Int]] = {
    val c = f.channels
    val hdr = 7 * c
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var blockStart = 0
    def s16(o: Int): Int =
      ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort.toInt
    while (blockStart + hdr <= f.dataLen) {
      val base = f.dataOff + blockStart
      val blockLen = math.min(f.blockAlign, f.dataLen - blockStart)
      val coef1 = new Array[Int](c); val coef2 = new Array[Int](c)
      val delta = new Array[Int](c)
      val s1 = new Array[Int](c); val s2 = new Array[Int](c)
      var ch = 0
      while (ch < c) {
        val p = bytes(base + ch) & 0xff
        if (p >= MsCoefs.length) return None // unknown predictor class
        coef1(ch) = MsCoefs(p)._1; coef2(ch) = MsCoefs(p)._2
        delta(ch) = s16(base + c + 2 * ch)
        s1(ch) = s16(base + 3 * c + 2 * ch)
        s2(ch) = s16(base + 5 * c + 2 * ch)
        ch += 1
      }
      var e = 0
      while (e < c) { out += s2(e); e += 1 }
      e = 0
      while (e < c) { out += s1(e); e += 1 }
      val nibCount = (blockLen - hdr) * 2
      var k = 0
      while (k < nibCount) {
        val by = bytes(base + hdr + k / 2) & 0xff
        val nib = if (k % 2 == 0) (by >> 4) & 0x0f else by & 0x0f
        val ch2 = k % c
        val st = msStep(s1(ch2), s2(ch2), delta(ch2), coef1(ch2),
          coef2(ch2), nib)
        s1(ch2) = st._1; s2(ch2) = st._2; delta(ch2) = st._3
        out += st._1
        k += 1
      }
      blockStart += f.blockAlign
    }
    if (out.isEmpty) None
    else {
      val limit =
        if (f.factSamples >= 0) math.min(out.length.toLong,
          f.factSamples * c).toInt
        else out.length
      Some(out.take(limit).toArray)
    }
  }

  // ------------------------------------------------------------ encode

  private def wavContainer(tag: Int, channels: Int, rate: Int,
      blockAlign: Int, bits: Int, factSamples: Long,
      payload: Array[Byte]): Array[Byte] = {
    val fmtLen = 18 // with cbSize = 0, the compressed-format convention
    val factLen = 4
    val total = 4 + (8 + fmtLen) + (8 + factLen) + (8 + payload.length) +
      (payload.length & 1)
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
    var o = 12
    tg(o, "fmt "); w32(o + 4, fmtLen.toLong)
    w16(o + 8, tag); w16(o + 10, channels); w32(o + 12, rate.toLong)
    val byteRate = tag match {
      case 17 => rate.toLong * blockAlign / math.max(1,
        1 + 2 * (blockAlign - 4 * channels) / channels)
      case _ => rate.toLong * channels
    }
    w32(o + 16, byteRate); w16(o + 20, blockAlign); w16(o + 22, bits)
    w16(o + 24, 0) // cbSize
    o += 8 + fmtLen
    tg(o, "fact"); w32(o + 4, factLen.toLong); w32(o + 8, factSamples)
    o += 8 + factLen
    tg(o, "data"); w32(o + 4, payload.length.toLong)
    System.arraycopy(payload, 0, out, o + 8, payload.length)
    out
  }

  /** G.711 WAV from raw companded BYTES (channel-interleaved) — the
    * constructed-payload door the mm_* oracles recompute from the same
    * byte formula. */
  def g711WavFromBytes(codes: Array[Byte], channels: Int, rate: Int,
      aLaw: Boolean): Array[Byte] = {
    require(channels >= 1 && codes.length % channels == 0, "interleave")
    wavContainer(if (aLaw) 6 else 7, channels, rate, channels, 8,
      codes.length.toLong / channels, codes)
  }

  /** G.711 WAV by compressing PCM16 samples (spec encoder — lossy). */
  def encodeG711Wav(samples: Array[Int], channels: Int, rate: Int,
      aLaw: Boolean): Array[Byte] = {
    require(samples.forall(s => s >= -32768 && s <= 32767), "PCM16 range")
    val enc: Int => Int = if (aLaw) linear2alaw else linear2ulaw
    g711WavFromBytes(samples.map(s => enc(s).toByte), channels, rate, aLaw)
  }

  /** Mono IMA-ADPCM WAV from an explicit initial state + nibble stream —
    * the constructed-payload door whose oracle replays [[imaStep]] as a
    * recursive CTE. One block holds everything (blockAlign sized to
    * fit); nibble count must be even (two per byte). */
  def imaWavFromNibbles(pred0: Int, idx0: Int, nibbles: Array[Int],
      rate: Int): Array[Byte] = {
    require(pred0 >= -32768 && pred0 <= 32767, "pred0 PCM16")
    require(idx0 >= 0 && idx0 <= 88, "idx0 in [0,88]")
    require(nibbles.length % 8 == 0, "nibbles in whole 4-byte groups")
    require(nibbles.forall(n => n >= 0 && n <= 15), "nibbles 4-bit")
    val payload = new Array[Byte](4 + nibbles.length / 2)
    payload(0) = (pred0 & 0xff).toByte
    payload(1) = ((pred0 >> 8) & 0xff).toByte
    payload(2) = idx0.toByte
    payload(3) = 0
    var i = 0
    while (i < nibbles.length / 2) {
      payload(4 + i) =
        ((nibbles(2 * i) & 0x0f) | ((nibbles(2 * i + 1) & 0x0f) << 4)).toByte
      i += 1
    }
    wavContainer(17, 1, rate, payload.length, 4,
      1L + nibbles.length, payload)
  }

  /** Mono IMA-ADPCM WAV by compressing PCM16 samples (spec quantizer —
    * lossy; first sample rides the block header verbatim). */
  def encodeImaWav(samples: Array[Int], rate: Int): Array[Byte] = {
    require(samples.nonEmpty, "need at least one sample")
    require(samples.forall(s => s >= -32768 && s <= 32767), "PCM16 range")
    var pred = samples(0)
    var idx = 0
    val nibbles = new Array[Int](((samples.length - 1) + 7) / 8 * 8)
    var i = 1
    while (i < samples.length) {
      val step = StepTable(idx)
      var delta = samples(i) - pred
      var n = 0
      if (delta < 0) { n = 8; delta = -delta }
      if (delta >= step) { n |= 4; delta -= step }
      if (delta >= (step >> 1)) { n |= 2; delta -= step >> 1 }
      if (delta >= (step >> 2)) n |= 1
      val s = imaStep(pred, idx, n)
      pred = s._1; idx = s._2
      nibbles(i - 1) = n
      i += 1
    }
    // the trailing pad nibbles (zeros) fall past the fact count
    val wav = imaWavFromNibbles(samples(0), 0, nibbles, rate)
    // patch fact to the true sample count (header + real nibbles)
    patchFact(wav, samples.length.toLong)
  }

  /** Mono MS-ADPCM WAV from an explicit block header + nibble stream —
    * the constructed-payload door whose oracle replays [[msStep]] as a
    * recursive CTE. One block holds everything; nibbles pack HIGH
    * nibble first. Emits 2 + nibbles.length samples (sample2, sample1,
    * then the decoded stream). */
  def msWavFromNibbles(predIdx: Int, delta0: Int, sample1: Int,
      sample2: Int, nibbles: Array[Int], rate: Int): Array[Byte] = {
    require(predIdx >= 0 && predIdx < MsCoefs.length, "predictor class")
    require(delta0 >= -32768 && delta0 <= 32767, "delta0 s16")
    require(sample1 >= -32768 && sample1 <= 32767, "sample1 PCM16")
    require(sample2 >= -32768 && sample2 <= 32767, "sample2 PCM16")
    require(nibbles.length % 2 == 0, "nibbles in whole bytes")
    require(nibbles.forall(n => n >= 0 && n <= 15), "nibbles 4-bit")
    val payload = new Array[Byte](7 + nibbles.length / 2)
    payload(0) = predIdx.toByte
    payload(1) = (delta0 & 0xff).toByte
    payload(2) = ((delta0 >> 8) & 0xff).toByte
    payload(3) = (sample1 & 0xff).toByte
    payload(4) = ((sample1 >> 8) & 0xff).toByte
    payload(5) = (sample2 & 0xff).toByte
    payload(6) = ((sample2 >> 8) & 0xff).toByte
    var i = 0
    while (i < nibbles.length / 2) {
      payload(7 + i) =
        (((nibbles(2 * i) & 0x0f) << 4) | (nibbles(2 * i + 1) & 0x0f)).toByte
      i += 1
    }
    wavContainer(2, 1, rate, payload.length, 4, 2L + nibbles.length,
      payload)
  }

  private def patchFact(wav: Array[Byte], samples: Long): Array[Byte] = {
    // fact chunk location is fixed by wavContainer's layout
    val o = 12 + 8 + 18 + 8
    wav(o) = (samples & 0xff).toByte
    wav(o + 1) = ((samples >> 8) & 0xff).toByte
    wav(o + 2) = ((samples >> 16) & 0xff).toByte
    wav(o + 3) = ((samples >> 24) & 0xff).toByte
    wav
  }
}
