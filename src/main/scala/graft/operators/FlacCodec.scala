package graft.operators

/** Pure-JVM FLAC decode — closing the compressed-audio half of the codec
  * seam the way PNG/JPEG (ImageIO), GIF rasters, MJPEG-AVI and PCM WAV
  * were closed: from the public format spec, no codec library. FLAC is
  * spec-bounded and dependency-free (fixed-order linear prediction +
  * rice-coded residuals over a bit stream), which is exactly why the
  * round-14 verdict ranked it the honest next decoder; inter-frame video
  * (H.264/VP9/AV1) stays behind the documented stub seam.
  *
  * Decoder surface: [[decodeFlacSamples]] parses the native-FLAC layout —
  * `fLaC` magic, metadata blocks (STREAMINFO read, the rest skipped),
  * then audio frames: 14-bit sync, frame header (block size / sample
  * rate / channel assignment / sample size codes, UTF-8-coded frame
  * number, CRC-8-covered), per-channel subframes (CONSTANT, VERBATIM,
  * FIXED orders 0-4, LPC orders 1-32, wasted-bits shift), rice-coded
  * residual partitions (4- and 5-bit parameter methods, escape code),
  * and the stereo decorrelation modes (left/side, right/side, mid/side).
  * Output is interleaved PCM ints. `None` on anything malformed — the
  * same degrade-to-byte-span contract as every other decode seam.
  *
  * [[flacToWav]] re-emits the decoded samples as a canonical PCM16 WAV,
  * so the EXISTING audio operators ([[MediaCodec.decodeWavStats]] /
  * `decodeWavEnvelope` and everything built on them) accept FLAC
  * payloads through one `orElse` — no second stats/envelope
  * implementation to keep in sync.
  *
  * Encoder surface ([[encodeFlac]]): the construct half of the
  * construct→decode→oracle test pattern (the SyntheticGif discipline) —
  * a real, spec-conforming encoder that picks CONSTANT for flat blocks
  * and otherwise the smaller of VERBATIM and rice-coded FIXED (orders
  * 0-2), so round-trip specs exercise the sync walk, both residual
  * paths, CRC-8/CRC-16, and multi-frame streams. Scale posture: both
  * ends are single-payload byte passes behind codegen'd expressions —
  * embarrassingly parallel over a corpus, nothing driver-side.
  */
object FlacCodec {

  // ---------------------------------------------------------------- bits

  private final class BitReader(bytes: Array[Byte], var byteOff: Int) {
    var bitOff = 0
    def atEnd: Boolean = byteOff >= bytes.length
    def align(): Unit = if (bitOff != 0) { bitOff = 0; byteOff += 1 }
    def readBit(): Int = {
      val b = (bytes(byteOff) >> (7 - bitOff)) & 1
      bitOff += 1
      if (bitOff == 8) { bitOff = 0; byteOff += 1 }
      b
    }
    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readSigned(n: Int): Int = {
      val v = readBits(n)
      if (n == 0) 0
      else if ((v & (1L << (n - 1))) != 0) (v - (1L << n)).toInt
      else v.toInt
    }
    /** Rice/unary: count zero bits to the terminating 1, then k LSBs. */
    def readRice(k: Int): Int = {
      var q = 0
      while (readBit() == 0) q += 1
      val u = (q.toLong << k) | readBits(k)
      // zigzag: even -> +u/2, odd -> -(u+1)/2
      if ((u & 1L) == 0L) (u >>> 1).toInt else (-((u + 1) >>> 1)).toInt
    }
  }

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nb += 1
      if (nb == 8) { buf.write(cur); cur = 0; nb = 0 }
    }
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >>> i) & 1L).toInt); i -= 1 }
    }
    def writeRice(x: Int, k: Int): Unit = {
      val u = if (x >= 0) x.toLong << 1 else ((-x.toLong) << 1) - 1
      val q = (u >>> k).toInt
      var i = 0
      while (i < q) { writeBit(0); i += 1 }
      writeBit(1)
      writeBits(u & ((1L << k) - 1), k)
    }
    def align(): Unit = while (nb != 0) writeBit(0)
    def toBytes: Array[Byte] = { align(); buf.toByteArray }
  }

  // ---------------------------------------------------------------- crc

  /** CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — covers the frame header. */
  private[graft] def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — covers the frame. */
  private[graft] def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
          else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  // ------------------------------------------------------------- decode

  /** Decoded stream: (channels, bitsPerSample, sampleRate,
    * channel-interleaved samples). */
  final case class FlacAudio(channels: Int, bps: Int, sampleRate: Int,
    samples: Array[Int])

  private val FixedCoefs: Array[Array[Int]] = Array(
    Array(), Array(1), Array(2, -1), Array(3, -3, 1), Array(4, -6, 4, -1))

  def decodeFlacSamples(bytes: Array[Byte]): Option[FlacAudio] = try {
    if (bytes == null || bytes.length < 42) return None
    if (!(bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a'
        && bytes(3) == 'C')) return None
    // metadata blocks: STREAMINFO is mandatory and first
    var off = 4
    var last = false
    var channels = 0
    var bps = 0
    var rate = 0
    var totalSamples = 0L // 36-bit STREAMINFO field; 0 = unknown
    var first = true
    while (!last) {
      if (off + 4 > bytes.length) return None
      val hdr = bytes(off) & 0xff
      last = (hdr & 0x80) != 0
      val btype = hdr & 0x7f
      val len = ((bytes(off + 1) & 0xff) << 16) | ((bytes(off + 2) & 0xff) << 8) |
        (bytes(off + 3) & 0xff)
      if (first && btype != 0) return None
      if (btype == 0) {
        if (len < 34 || off + 4 + 34 > bytes.length) return None
        val b = off + 4
        rate = ((bytes(b + 10) & 0xff) << 12) | ((bytes(b + 11) & 0xff) << 4) |
          ((bytes(b + 12) & 0xff) >> 4)
        channels = ((bytes(b + 12) >> 1) & 0x07) + 1
        bps = (((bytes(b + 12) & 0x01) << 4) | ((bytes(b + 13) & 0xff) >> 4)) + 1
        totalSamples = ((bytes(b + 13) & 0x0f).toLong << 32) |
          ((bytes(b + 14) & 0xffL) << 24) | ((bytes(b + 15) & 0xffL) << 16) |
          ((bytes(b + 16) & 0xffL) << 8) | (bytes(b + 17) & 0xffL)
      }
      first = false
      off += 4 + len
    }
    if (channels < 1 || bps < 4 || off > bytes.length) return None

    val out = new java.io.ByteArrayOutputStream() // packed big-endian ints
    val sink = new java.io.DataOutputStream(out)
    var nTotal = 0
    var perCh = 0L // samples per channel decoded so far
    // Stop once STREAMINFO's total-samples count is reached (tolerates
    // appended trailers like ID3v1); with an unknown total (0), tolerate
    // trailing non-sync bytes after at least one good frame.
    import scala.util.control.Breaks.{break, breakable}
    breakable { while (off < bytes.length && (totalSamples == 0L || perCh < totalSamples)) {
      val br = new BitReader(bytes, off)
      // frame header --------------------------------------------------
      if (br.readBits(14) != 0x3ffe) { // sync
        // Known-length streams stop via the sample count above, so a
        // mismatch here after good frames is a trailer — break. With an
        // UNKNOWN total (STREAMINFO total-samples == 0), only accept the
        // tail as trailing non-audio bytes when it can't plausibly start
        // a frame: ID3v1-sized (<=128 B) or not 0xFF-prefixed. A long
        // 0xFF-led tail is mid-stream corruption -> reject the decode.
        if (nTotal > 0 && (totalSamples != 0L ||
            bytes.length - off <= 128 || (bytes(off) & 0xff) != 0xff)) break()
        else return None
      }
      if (br.readBit() != 0) return None         // reserved
      br.readBit()                               // blocking strategy
      val bsCode = br.readBits(4).toInt
      val srCode = br.readBits(4).toInt
      val chCode = br.readBits(4).toInt
      val ssCode = br.readBits(3).toInt
      if (br.readBit() != 0) return None         // reserved
      // UTF-8-coded frame/sample number: walk it (value unused)
      val lead = br.readBits(8).toInt
      var follow = 0
      var l = lead
      while ((l & 0x80) != 0 && follow < 7) { follow += 1; l <<= 1 }
      // follow == 7 (6 continuation bytes) is valid for variable-blocksize
      // streams with sample numbers >= 2^31; only follow == 1 is malformed.
      if (follow == 1) return None
      var i = 1
      while (i < follow) {
        if ((br.readBits(8).toInt & 0xc0) != 0x80) return None
        i += 1
      }
      val blockSize = bsCode match {
        case 0 => return None
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => br.readBits(8).toInt + 1
        case 7 => br.readBits(16).toInt + 1
        case c => 256 << (c - 8)
      }
      srCode match { // value unused beyond stream position
        case 12 => br.readBits(8)
        case 13 | 14 => br.readBits(16)
        case 15 => return None
        case _ => ()
      }
      val frameBps = ssCode match {
        case 0 => bps
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case _ => return None
      }
      val nCh = if (chCode <= 7) chCode + 1 else 2
      if (chCode > 10) return None
      if (chCode <= 7 && nCh != channels) return None
      if (chCode > 7 && channels != 2) return None
      // CRC-8 over the header bytes read so far
      br.align()
      val crcByte = bytes(br.byteOff) & 0xff
      if (crc8(bytes, off, br.byteOff) != crcByte) return None
      br.byteOff += 1

      // subframes ------------------------------------------------------
      val chans = Array.ofDim[Long](nCh, blockSize)
      var ch = 0
      while (ch < nCh) {
        // side channels carry one extra bit
        val sbps = frameBps + (chCode match {
          case 8 => if (ch == 1) 1 else 0  // left/side
          case 9 => if (ch == 0) 1 else 0  // right/side
          case 10 => if (ch == 1) 1 else 0 // mid/side
          case _ => 0
        })
        if (br.readBit() != 0) return None // subframe header padding bit
        val sfType = br.readBits(6).toInt
        var wasted = 0
        if (br.readBit() == 1) {
          wasted = 1
          while (br.readBit() == 0) wasted += 1
        }
        val ebps = sbps - wasted
        val v = chans(ch)
        def readResidual(order: Int): Unit = {
          val method = br.readBits(2).toInt
          if (method > 1) throw new IllegalArgumentException("residual method")
          val pbits = if (method == 0) 4 else 5
          val esc = if (method == 0) 15 else 31
          val pOrder = br.readBits(4).toInt
          val nPart = 1 << pOrder
          if (blockSize % nPart != 0) throw new IllegalArgumentException("parts")
          var p = 0
          var idx = order
          while (p < nPart) {
            val cnt = (blockSize >> pOrder) - (if (p == 0) order else 0)
            val k = br.readBits(pbits).toInt
            if (k == esc) {
              val raw = br.readBits(5).toInt
              var j = 0
              while (j < cnt) { v(idx) = br.readSigned(raw); idx += 1; j += 1 }
            } else {
              var j = 0
              while (j < cnt) { v(idx) = br.readRice(k); idx += 1; j += 1 }
            }
            p += 1
          }
        }
        def predictFixed(order: Int): Unit = {
          val co = FixedCoefs(order)
          var t = order
          while (t < blockSize) {
            var acc = v(t)
            var j = 0
            while (j < order) { acc += co(j) * v(t - 1 - j); j += 1 }
            v(t) = acc
            t += 1
          }
        }
        if (sfType == 0) { // CONSTANT
          val c = br.readSigned(ebps).toLong
          java.util.Arrays.fill(v, c)
        } else if (sfType == 1) { // VERBATIM
          var t = 0
          while (t < blockSize) { v(t) = br.readSigned(ebps); t += 1 }
        } else if ((sfType & 0x38) == 0x08 && (sfType & 0x07) <= 4) { // FIXED
          val order = sfType & 0x07
          var t = 0
          while (t < order) { v(t) = br.readSigned(ebps); t += 1 }
          readResidual(order)
          predictFixed(order)
        } else if ((sfType & 0x20) == 0x20) { // LPC
          val order = (sfType & 0x1f) + 1
          var t = 0
          while (t < order) { v(t) = br.readSigned(ebps); t += 1 }
          val prec = br.readBits(4).toInt + 1
          if (prec == 16) return None
          val shift = br.readSigned(5)
          if (shift < 0) return None
          val coefs = new Array[Int](order)
          var j = 0
          while (j < order) { coefs(j) = br.readSigned(prec); j += 1 }
          readResidual(order)
          t = order
          while (t < blockSize) {
            var acc = 0L
            j = 0
            while (j < order) { acc += coefs(j).toLong * v(t - 1 - j); j += 1 }
            v(t) = v(t) + (acc >> shift)
            t += 1
          }
        } else return None
        if (wasted > 0) {
          var t = 0
          while (t < blockSize) { v(t) = v(t) << wasted; t += 1 }
        }
        ch += 1
      }
      br.align()
      val frameCrc = ((bytes(br.byteOff) & 0xff) << 8) | (bytes(br.byteOff + 1) & 0xff)
      if (crc16(bytes, off, br.byteOff) != frameCrc) return None
      br.byteOff += 2

      // stereo decorrelation + interleave -----------------------------
      var t = 0
      while (t < blockSize) {
        chCode match {
          case 8 => // left/side: right = left - side
            val lft = chans(0)(t); val side = chans(1)(t)
            sink.writeInt(lft.toInt); sink.writeInt((lft - side).toInt)
          case 9 => // right/side: left = right + side
            val side = chans(0)(t); val rgt = chans(1)(t)
            sink.writeInt((rgt + side).toInt); sink.writeInt(rgt.toInt)
          case 10 => // mid/side: mid stored floor((L+R)/2), LSB from side
            val mid = chans(0)(t); val side = chans(1)(t)
            val m2 = (mid << 1) | (side & 1L)
            val lft = (m2 + side) >> 1
            sink.writeInt(lft.toInt); sink.writeInt((lft - side).toInt)
          case _ =>
            var c = 0
            while (c < nCh) { sink.writeInt(chans(c)(t).toInt); c += 1 }
        }
        t += 1
      }
      nTotal += blockSize * channels
      perCh += blockSize
      off = br.byteOff
    } }
    if (nTotal == 0) return None
    val packed = out.toByteArray
    val samples = new Array[Int](nTotal)
    var s = 0
    while (s < nTotal) {
      val o = s * 4
      samples(s) = ((packed(o) & 0xff) << 24) | ((packed(o + 1) & 0xff) << 16) |
        ((packed(o + 2) & 0xff) << 8) | (packed(o + 3) & 0xff)
      s += 1
    }
    Some(FlacAudio(channels, bps, rate, samples))
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Decode FLAC and re-emit canonical PCM16 WAV bytes (the
    * [[MediaCodec.decodeWavStats]] / `decodeWavEnvelope` input contract),
    * so every existing audio operator takes FLAC through one `orElse`.
    * Only 16-bit streams qualify — other depths return None rather than
    * silently rescale. */
  def flacToWav(bytes: Array[Byte]): Option[Array[Byte]] =
    decodeFlacSamples(bytes).flatMap { a =>
      if (a.bps != 16) None
      else {
        val n = a.samples.length
        val data = new Array[Byte](44 + 2 * n)
        def w32(o: Int, v: Long): Unit = {
          data(o) = (v & 0xff).toByte
          data(o + 1) = ((v >> 8) & 0xff).toByte
          data(o + 2) = ((v >> 16) & 0xff).toByte
          data(o + 3) = ((v >> 24) & 0xff).toByte
        }
        def w16(o: Int, v: Int): Unit = {
          data(o) = (v & 0xff).toByte
          data(o + 1) = ((v >> 8) & 0xff).toByte
        }
        def tag(o: Int, s: String): Unit = {
          var i = 0
          while (i < 4) { data(o + i) = s.charAt(i).toByte; i += 1 }
        }
        tag(0, "RIFF"); w32(4, 36L + 2 * n); tag(8, "WAVE")
        tag(12, "fmt "); w32(16, 16L)
        w16(20, 1); w16(22, a.channels)
        w32(24, a.sampleRate.toLong)
        w32(28, a.sampleRate.toLong * a.channels * 2)
        w16(32, a.channels * 2); w16(34, 16)
        tag(36, "data"); w32(40, 2L * n)
        var i = 0
        while (i < n) {
          w16(44 + 2 * i, a.samples(i) & 0xffff)
          i += 1
        }
        Some(data)
      }
    }

  // ------------------------------------------------------------- encode

  /** Spec-conforming FLAC encoder for constructed test payloads: 16-bit
    * only, fixed `blockSize`, per-block subframe choice = CONSTANT when
    * flat, else the smaller of VERBATIM and rice-coded FIXED (order
    * 0-2, parameter swept 0-14, single partition) — deterministic, so
    * encoded byte streams are stable test literals. Samples are
    * channel-interleaved PCM16 ints. */
  def encodeFlac(samples: Array[Int], channels: Int, sampleRate: Int,
      blockSize: Int = 1024): Array[Byte] = {
    require(channels >= 1 && channels <= 8, "channels in [1,8]")
    require(samples.length % channels == 0, "interleave mismatch")
    require(blockSize >= 16 && blockSize <= 65535, "blockSize in [16,65535]")
    require(samples.forall(s => s >= -32768 && s <= 32767),
      "samples must fit PCM16 (this encoder is 16-bit only)")
    require(sampleRate > 0 && sampleRate < (1 << 20),
      "sampleRate must fit STREAMINFO's 20-bit field")
    val nFrames = samples.length / channels
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO (last-metadata flag set, length 34)
    val si = new BitWriter
    si.writeBits(blockSize.toLong, 16)      // min block size
    si.writeBits(blockSize.toLong, 16)      // max block size
    si.writeBits(0L, 24); si.writeBits(0L, 24) // frame sizes unknown
    si.writeBits(sampleRate.toLong, 20)
    si.writeBits((channels - 1).toLong, 3)
    si.writeBits(15L, 5)                    // bps - 1 = 15
    si.writeBits(nFrames.toLong, 36)
    var i = 0
    while (i < 16) { si.writeBits(0L, 8); i += 1 } // md5 unset
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    out.write(si.toBytes)

    var frameNo = 0
    var base = 0
    while (base < nFrames) {
      val bs = math.min(blockSize, nFrames - base)
      val hdr = new BitWriter
      hdr.writeBits(0x3ffe, 14)
      hdr.writeBit(0)                       // reserved
      hdr.writeBit(0)                       // fixed blocking
      hdr.writeBits(7L, 4)                  // block size: 16-bit at end
      hdr.writeBits(0L, 4)                  // sample rate: from STREAMINFO
      hdr.writeBits((channels - 1).toLong, 4) // independent channels
      hdr.writeBits(4L, 3)                  // 16 bps
      hdr.writeBit(0)                       // reserved
      // UTF-8 frame number (fixed blocking -> frame index)
      if (frameNo < 0x80) hdr.writeBits(frameNo.toLong, 8)
      else {
        require(frameNo < 0x800, "frame number overflow for test encoder")
        hdr.writeBits(0xc0L | (frameNo >> 6).toLong, 8)
        hdr.writeBits(0x80L | (frameNo & 0x3f).toLong, 8)
      }
      hdr.writeBits((bs - 1).toLong, 16)
      val hdrBytes = hdr.toBytes
      val frame = new java.io.ByteArrayOutputStream()
      frame.write(hdrBytes)
      frame.write(crc8(hdrBytes, 0, hdrBytes.length))

      val body = new BitWriter
      var ch = 0
      while (ch < channels) {
        val v = new Array[Int](bs)
        var t = 0
        while (t < bs) { v(t) = samples((base + t) * channels + ch); t += 1 }
        writeSubframe(body, v)
        ch += 1
      }
      val bodyBytes = body.toBytes
      frame.write(bodyBytes)
      val fb = frame.toByteArray
      val crc = crc16(fb, 0, fb.length)
      frame.write((crc >> 8) & 0xff); frame.write(crc & 0xff)
      out.write(frame.toByteArray)
      frameNo += 1
      base += bs
    }
    out.toByteArray
  }

  /** Best-of {CONSTANT, VERBATIM, FIXED 0-2 + rice}: cost in bits,
    * deterministic tie-break (lowest order wins, VERBATIM last). */
  private def writeSubframe(w: BitWriter, v: Array[Int]): Unit = {
    val bs = v.length
    var allEq = true
    var t = 1
    while (t < bs && allEq) { if (v(t) != v(0)) allEq = false; t += 1 }
    if (allEq) {
      w.writeBit(0); w.writeBits(0L, 6); w.writeBit(0) // CONSTANT
      w.writeBits(v(0).toLong & 0xffff, 16)
      return
    }
    def residual(order: Int): Array[Int] = {
      val co = FixedCoefs(order)
      val r = new Array[Int](bs - order)
      var t = order
      while (t < bs) {
        var acc = v(t).toLong
        var j = 0
        while (j < order) { acc -= co(j).toLong * v(t - 1 - j); j += 1 }
        if (acc < Int.MinValue || acc > Int.MaxValue)
          return null // overflowing predictor: not a candidate
        r(t - order) = acc.toInt
        t += 1
      }
      r
    }
    def riceLen(r: Array[Int], k: Int): Long = {
      var bits = 0L
      var j = 0
      while (j < r.length) {
        val x = r(j)
        val u = if (x >= 0) x.toLong << 1 else ((-x.toLong) << 1) - 1
        bits += (u >>> k) + 1 + k
        j += 1
      }
      bits
    }
    var bestOrder = -1
    var bestK = 0
    var bestBits = 16L * bs // VERBATIM cost (minus shared header)
    var order = 0
    while (order <= 2) {
      val r = residual(order)
      if (r != null) {
        var k = 0
        while (k <= 14) {
          val bits = 16L * order + 2 + 4 + 4 + riceLen(r, k)
          if (bits < bestBits) { bestOrder = order; bestK = k; bestBits = bits }
          k += 1
        }
      }
      order += 1
    }
    if (bestOrder < 0) {
      w.writeBit(0); w.writeBits(1L, 6); w.writeBit(0) // VERBATIM
      var t = 0
      while (t < bs) { w.writeBits(v(t).toLong & 0xffff, 16); t += 1 }
    } else {
      w.writeBit(0); w.writeBits((0x08 | bestOrder).toLong, 6); w.writeBit(0)
      var t = 0
      while (t < bestOrder) { w.writeBits(v(t).toLong & 0xffff, 16); t += 1 }
      w.writeBits(0L, 2)                    // residual method 0 (4-bit)
      w.writeBits(0L, 4)                    // partition order 0
      w.writeBits(bestK.toLong, 4)
      val r = residual(bestOrder)
      var j = 0
      while (j < r.length) { w.writeRice(r(j), bestK); j += 1 }
    }
  }
}
