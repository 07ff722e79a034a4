package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video payloads ride through the
  * engine as opaque `binary` columns with typed metadata; decode /
  * feature-extraction runs as a partition-local batch transform.
  *
  * The Spark-side plumbing here is real and tested — schema, partitioning,
  * batch iteration shape, magic-byte sniffing — and so is the IMAGE codec:
  * PNG/JPEG/GIF payloads decode through JDK ImageIO
  * ([[MediaCodec.decodeImageGrid]] — java.desktop, no external
  * dependency) into the perceptual-hash grid and the feature path, PCM
  * WAV decodes through the RIFF walk, and VIDEO FRAMES decode per-frame
  * for both multi-frame containers the JDK can handle — animated GIF
  * stored rasters ([[MediaCodec.decodeGifFrames]]) and MJPEG-in-AVI
  * `movi` chunks ([[MediaCodec.decodeAviFrames]]), unified behind
  * [[MediaCodec.decodeVideoFrames]] →
  * [[Multimodal.videoFramePhashes]] / [[Multimodal.videoFrameDupPairs]].
  * True inter-frame video codecs (H.264/VP9) stay STUBBED behind
  * [[MediaCodec.decodeStub]] (no ffmpeg in this container): a
  * deterministic fake feature vector from the bytes, with the swap point
  * marked. Everything else — including the
  * 100 TB behavior (no shuffle, executor-local batches, fixed-width
  * output schema) — is in place either way.
  */
object Multimodal {

  final case class MediaRow(id: Long, media: Array[Byte], format: String)
  final case class MediaFeatures(id: Long, format: String, byte_len: Int,
      features: Array[Float])

  /** Container format from magic bytes — real detection logic. */
  def sniffFormat(bytes: Array[Byte]): String = {
    def startsWith(sig: Int*): Boolean =
      bytes.length >= sig.length &&
        sig.zipWithIndex.forall { case (b, i) => (bytes(i) & 0xff) == b }
    if (startsWith(0x89, 0x50, 0x4e, 0x47)) "png"
    else if (startsWith(0xff, 0xd8, 0xff)) "jpeg"
    else if (startsWith(0x47, 0x49, 0x46, 0x38)) "gif" // GIF87a/GIF89a
    else if (startsWith(0x52, 0x49, 0x46, 0x46)) "riff" // wav/avi container
    else if (startsWith(0x49, 0x44, 0x33)) "mp3"
    else "unknown"
  }

  /** Columnar metadata projection over a binary column: byte length + magic
    * format — pure codegen'd expressions (binary-literal prefix compares),
    * no UDF, so the projection rides inside whole-stage codegen. */
  def withMediaMeta(df: DataFrame, binCol: String): DataFrame = {
    def sig(bytes: Int*) = lit(bytes.map(_.toByte).toArray)
    val b = col(binCol)
    df.withColumn("byte_len", length(b))
      .withColumn("format",
        when(substring(b, 1, 4) === sig(0x89, 0x50, 0x4e, 0x47), "png")
          .when(substring(b, 1, 3) === sig(0xff, 0xd8, 0xff), "jpeg")
          .when(substring(b, 1, 4) === sig(0x47, 0x49, 0x46, 0x38), "gif")
          .when(substring(b, 1, 4) === sig(0x52, 0x49, 0x46, 0x46), "riff")
          .when(substring(b, 1, 3) === sig(0x49, 0x44, 0x33), "mp3")
          .otherwise("unknown"))
  }

  /** Deterministic byte sampling: every `stride`-th byte of the payload,
    * bounded to `maxFrames` — the plumbing shape of video frame-sampling
    * (slice positions are where a real demuxer would seek). Frame count is
    * ceil(len/stride) capped at maxFrames, so every sampled position lies
    * strictly inside the payload (no phantom empty frames when stride
    * divides the length) and empty payloads produce empty frame lists. */
  def frameSample(df: DataFrame, binCol: String, stride: Int,
      maxFrames: Int): DataFrame =
    df.withColumn("frames", expr(
      s"""CASE WHEN length($binCol) = 0 OR $binCol IS NULL THEN CAST(array() AS ARRAY<BINARY>)
         |ELSE transform(
         |  sequence(0, least(int((length($binCol) + ${stride - 1}) div $stride) - 1, ${maxFrames - 1})),
         |  i -> substring($binCol, i * $stride + 1, 1)) END""".stripMargin))

  /** Partition-local batch decode + feature extraction. The iterator shape
    * (consume a partition's rows as one batch stream, emit fixed-width
    * vectors) is exactly what a real model-inference UDF needs. Decodable
    * PNG/JPEG payloads get REAL pixel-statistic features
    * ([[MediaCodec.decode]], JDK ImageIO); other formats keep the marked
    * [[MediaCodec.decodeStub]]. */
  def decodeFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      rows.map { r =>
        MediaFeatures(r.id, r.format,
          if (r.media == null) 0 else r.media.length,
          MediaCodec.decode(r.media, dim))
      }
    }
  }

  /** Byte value (0-255) at 1-based position `i` of the hex string `hx`. */
  private def byteAt(hx: String, i: String): String =
    s"CAST(conv(substring($hx, CAST(2 * ($i) - 1 AS INT), 2), 16, 10) AS BIGINT)"

  /** Container-header metadata parsed from the LEADING BYTES of a binary
    * media column — REAL parsing, not a stub (header fields live before
    * any codec payload, so no media library is needed):
    *
    *  - PNG: IHDR width/height (big-endian u32 at bytes 17-24, after the
    *    8-byte signature + length + "IHDR" tag, which is verified);
    *  - JPEG: a bounded SOF-marker walk — segments are (0xFF, marker,
    *    u16 length incl. itself) links, so a 24-step integer fold follows
    *    them until the first SOF0-SOF15 frame header (excluding the
    *    non-frame C4/C8/CC markers) and reads height/width from it;
    *    malformed chains or >24 segments yield NULLs, never errors;
    *  - WAV: channels (LE u16 at 23-24) + sample rate (LE u32 at 25-28)
    *    from the canonical RIFF/"WAVE"/"fmt " layout (tags verified).
    *
    * Everything is codegen'd hex/substring/conv arithmetic inside the
    * projection — no UDF, scan-bound at any corpus size. Adds `format`
    * ([[withMediaMeta]]'s magic sniff), `width`, `height`, `channels`,
    * `sample_rate` (BIGINT, NULL where not applicable/parseable). */
  def withMediaHeaders(df: DataFrame, binCol: String): DataFrame = {
    val withHx = withMediaMeta(df, binCol).withColumn("__hx", hex(col(binCol)))
    val hx = "__hx"
    val pngOk =
      s"format = 'png' AND length($binCol) >= 24 AND substring($hx, 25, 8) = '49484452'"
    val wavOk =
      s"""format = 'riff' AND length($binCol) >= 28
         | AND substring($hx, 17, 8) = '57415645'
         | AND substring($hx, 25, 8) = '666D7420'""".stripMargin
    // the JPEG walk: acc = (pos of current segment's 0xFF, h, w); h >= 0
    // terminates, pos < 0 marks a broken chain
    val jpegSof =
      s"""aggregate(sequence(1, 24),
         |  named_struct('pos', 3L, 'h', -1L, 'w', -1L),
         |  (acc, it) -> CASE
         |    WHEN acc.h >= 0 OR acc.pos < 0 THEN acc
         |    WHEN acc.pos + 8 > length($binCol)
         |         OR ${byteAt(hx, "acc.pos")} <> 255
         |      THEN named_struct('pos', -1L, 'h', -1L, 'w', -1L)
         |    WHEN ${byteAt(hx, "acc.pos + 1")} BETWEEN 192 AND 207
         |         AND ${byteAt(hx, "acc.pos + 1")} NOT IN (196, 200, 204)
         |      THEN named_struct('pos', acc.pos,
         |        'h', ${byteAt(hx, "acc.pos + 5")} * 256 + ${byteAt(hx, "acc.pos + 6")},
         |        'w', ${byteAt(hx, "acc.pos + 7")} * 256 + ${byteAt(hx, "acc.pos + 8")})
         |    ELSE named_struct(
         |      'pos', acc.pos + 2 + ${byteAt(hx, "acc.pos + 2")} * 256 + ${byteAt(hx, "acc.pos + 3")},
         |      'h', -1L, 'w', -1L)
         |  END,
         |  acc -> IF(acc.h >= 0, named_struct('h', acc.h, 'w', acc.w),
         |            named_struct('h', CAST(NULL AS BIGINT), 'w', CAST(NULL AS BIGINT))))""".stripMargin
    withHx
      .withColumn("__sof",
        expr(s"CASE WHEN format = 'jpeg' AND length($binCol) >= 4 THEN $jpegSof " +
          "ELSE named_struct('h', CAST(NULL AS BIGINT), 'w', CAST(NULL AS BIGINT)) END"))
      .withColumn("width", expr(
        s"""CASE WHEN $pngOk THEN CAST(conv(substring($hx, 33, 8), 16, 10) AS BIGINT)
           |ELSE __sof.w END""".stripMargin))
      .withColumn("height", expr(
        s"""CASE WHEN $pngOk THEN CAST(conv(substring($hx, 41, 8), 16, 10) AS BIGINT)
           |ELSE __sof.h END""".stripMargin))
      .withColumn("channels", expr(
        s"CASE WHEN $wavOk THEN ${byteAt(hx, "23")} + ${byteAt(hx, "24")} * 256 ELSE CAST(NULL AS BIGINT) END"))
      .withColumn("sample_rate", expr(
        s"""CASE WHEN $wavOk THEN ${byteAt(hx, "25")} + ${byteAt(hx, "26")} * 256
           | + ${byteAt(hx, "27")} * 65536 + ${byteAt(hx, "28")} * 16777216
           |ELSE CAST(NULL AS BIGINT) END""".stripMargin))
      .drop("__hx", "__sof")
  }

  /** Perceptual-hash (dHash) near-dup pairs over a binary media column —
    * the image analog of [[Dedup.simhashNearDups]]: two images whose
    * downsampled gradients agree are the same picture re-encoded, resized
    * or slightly edited, which byte-level exact dedup can never see.
    *
    * Pipeline: payload → [[PerceptualHash.GridH]]×[[PerceptualHash.GridW]]
    * intensity grid → horizontal-gradient bits (cell > right neighbor) →
    * 56-bit fingerprint → 8 banded 7-bit chunks → bucket equi-join for
    * candidates → exact Hamming verify on the single-long fingerprints.
    * By pigeonhole, any pair within Hamming ≤ 7 shares an unchanged chunk,
    * so the banded candidates are COMPLETE for every `maxHamming ≤ 7` —
    * banding is a speedup, not an approximation. The candidate join
    * carries only (id, chunk-key, fingerprint): narrow rows, never a
    * cartesian; empty payloads are excluded before the join (they all
    * share one degenerate fingerprint — the quadratic-flood guard, same
    * as simhash's no-shingle filter; byte-exact dedup owns that case).
    *
    * The GRID step decodes REAL images: payloads that sniff as PNG/JPEG
    * and decode under JDK ImageIO are grayscale-resampled to the true 9×7
    * pixel grid ([[MediaCodec.decodeImageGrid]] via
    * [[graft.functions.PhashNative.imageGridOrRaw]]); everything else
    * keeps the byte-span grid (each cell the integer mean of its payload
    * byte span — deterministic, byte-exact on arbitrary binary, and
    * oracle-replayable; the decoded branch is pinned by the spec's
    * hand-computed PNG fingerprint instead, since DuckDB has no codec).
    * Everything downstream of the grid is the production pipeline
    * unchanged.
    *
    * Scale shape: per-row hashing cost is one linear pass over the
    * payload ([[graft.functions.PhashNative.dhash56]], a native Catalyst
    * expression — the interpreted HOF formulation it replaced measured
    * ~2 ms per 300-byte fingerprint); chunk buckets carry
    * 7 bits each so expected bucket size grows N/128 — the 100 TB path
    * widens the fingerprint/chunks exactly like the simhash scale note.
    * Output: (id_a, id_b, hamming), id_a < id_b, hamming ≤ `maxHamming`. */
  def phashPairs(df: DataFrame, idCol: String, binCol: String,
      maxHamming: Int = 6): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= PerceptualHash.Chunks - 1,
      s"banded candidates are only complete for maxHamming <= " +
        s"${PerceptualHash.Chunks - 1}; got $maxHamming")
    val fp = df.select(col(idCol).as("id"), col(binCol).as("b"))
      .filter(col("b").isNotNull && length(col("b")) > 0)
      .select(col("id"),
        graft.functions.PhashNative.dhash56(
          graft.functions.PhashNative.imageGridOrRaw(col("b"))).as("f"))
      .persist()
    fp.count()
    val chunks = fp.select(col("id"), col("f"),
      explode(expr(PerceptualHash.sparkChunks("f"))).as("ck"))
    val out = chunks.as("a")
      .join(chunks.as("c"), col("a.ck") === col("c.ck") && col("a.id") < col("c.id"))
      .select(col("a.id").as("id_a"), col("c.id").as("id_b"),
        bit_count(col("a.f").bitwiseXOR(col("c.f"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .persist()
    out.count()
    fp.unpersist(false)
    out
  }

  /** SEGMENT-level perceptual near-dup — the video/scene analog of
    * [[phashPairs]]: each payload splits into `nSegs` contiguous byte
    * segments (where a real pipeline would cut GOPs / scenes), each
    * segment gets its own 56-bit dHash, and near-dup segments are found
    * ACROSS payloads and WITHIN one (shared intros, looped content) by
    * the same pigeonhole-complete chunk banding. Everything from the
    * grid down is [[PerceptualHash]] unchanged — one extra explode and
    * a hex-substring slice per segment, still zero UDFs.
    *
    * Degenerate-fingerprint guard: segments whose fingerprint is 0 (flat
    * or too-short spans — no gradient bits) would all collide in every
    * band and flood the candidate join quadratically; they carry no
    * perceptual signal, so both sides drop them (the simhash no-shingle
    * filter's analog, applied symmetrically by the oracle).
    *
    * Scale shape: rows grow nSegs-fold but each hashes only its slice,
    * so total hashing work stays one pass over the bytes; candidate
    * buckets stay 7-bit chunks over the (id, seg) universe. Output:
    * (id_a, seg_a, id_b, seg_b, hamming), (id_a, seg_a) < (id_b, seg_b),
    * same-payload pairs included with seg_a < seg_b. */
  /** The (id, seg, f) segment-fingerprint projection shared by the pair
    * and probe stages: nSegs byte slices per payload, native dhash56 per
    * slice, zero (gradient-free) fingerprints dropped. */
  private def segmentPhashes(df: DataFrame, idCol: String, binCol: String,
      nSegs: Int): DataFrame =
    df.select(col(idCol).as("id"), col(binCol).as("b"))
      .filter(col("b").isNotNull && length(col("b")) > 0)
      .withColumn("bn", length(col("b")).cast("long"))
      .withColumn("seg", explode(sequence(lit(0L), lit(nSegs - 1L))))
      .withColumn("st", expr(s"seg * bn div $nSegs"))
      .withColumn("en", expr(s"(seg + 1) * bn div $nSegs"))
      .filter(col("en") > col("st"))
      // binary substring slices bytes (1-based pos), so the segment feeds
      // the native fingerprint without the hex detour
      .select(col("id"), col("seg"),
        graft.functions.PhashNative.dhash56(expr(
          "substring(b, CAST(st + 1 AS INT), CAST(en - st AS INT))")).as("f"))
      .filter(col("f") =!= 0L)

  def segmentPhashPairs(df: DataFrame, idCol: String, binCol: String,
      nSegs: Int, maxHamming: Int = 6): DataFrame = {
    require(nSegs > 0, s"nSegs must be > 0, got $nSegs")
    require(maxHamming >= 0 && maxHamming <= PerceptualHash.Chunks - 1,
      s"banded candidates are only complete for maxHamming <= " +
        s"${PerceptualHash.Chunks - 1}; got $maxHamming")
    val fp = segmentPhashes(df, idCol, binCol, nSegs).persist()
    fp.count()
    val chunks = fp.select(col("id"), col("seg"), col("f"),
      explode(expr(PerceptualHash.sparkChunks("f"))).as("ck"))
    val out = chunks.as("a")
      .join(chunks.as("c"), col("a.ck") === col("c.ck") &&
        (col("a.id") < col("c.id") ||
          (col("a.id") === col("c.id") && col("a.seg") < col("c.seg"))))
      .select(col("a.id").as("id_a"), col("a.seg").as("seg_a"),
        col("c.id").as("id_b"), col("c.seg").as("seg_b"),
        bit_count(col("a.f").bitwiseXOR(col("c.f"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .persist()
    out.count()
    fp.unpersist(false)
    out
  }

  /** Batch-vs-corpus segment perceptual probe — the INCREMENTAL shape of
    * [[segmentPhashPairs]] (a crawl batch asks "which stored media do my
    * segments near-match?" without re-pairing the stored corpus against
    * itself): corpus segments fingerprint+band once, probe segments band
    * the same way, and the ONLY join is probe-chunks × corpus-chunks —
    * candidate cost tracks the BATCH, not the corpus pair count, which
    * is what makes this the 100 TB admission path (the all-pairs form is
    * quadratic in stored media by construction on low-entropy payloads —
    * measured in BASELINE's round-14 note). Same pigeonhole-complete
    * chunk banding + exact Hamming verify; probe ids may overlap corpus
    * ids (self-matches are filtered). Output: (probe_id, probe_seg,
    * match_id, match_seg, hamming). */
  def segmentPhashProbe(corpus: DataFrame, probes: DataFrame,
      idCol: String, binCol: String, nSegs: Int,
      maxHamming: Int = 6): DataFrame = {
    require(nSegs > 0, s"nSegs must be > 0, got $nSegs")
    require(maxHamming >= 0 && maxHamming <= PerceptualHash.Chunks - 1,
      s"banded candidates are only complete for maxHamming <= " +
        s"${PerceptualHash.Chunks - 1}; got $maxHamming")
    def chunks(df: DataFrame) =
      segmentPhashes(df, idCol, binCol, nSegs)
        .select(col("id"), col("seg"), col("f"),
          explode(expr(PerceptualHash.sparkChunks("f"))).as("ck"))
    chunks(probes).as("p")
      .join(chunks(corpus).as("c"),
        col("p.ck") === col("c.ck") && col("p.id") =!= col("c.id"))
      .select(col("p.id").as("probe_id"), col("p.seg").as("probe_seg"),
        col("c.id").as("match_id"), col("c.seg").as("match_seg"),
        bit_count(col("p.f").bitwiseXOR(col("c.f"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** REAL video-frame perceptual hashes: animated-GIF and MJPEG-AVI
    * payloads decode to per-frame luma grids
    * ([[MediaCodec.decodeVideoFrames]] — the two multi-frame containers
    * the JDK decodes; true inter-frame codecs remain behind the
    * documented stub) and each frame gets the production 56-bit
    * dHash. One narrow projection (native decode expression → posexplode
    * → native dhash56), no shuffle, frame count bounded per payload by
    * `maxFrames`. Undecodable payloads contribute no rows.
    * Output: (id, frame_idx, f) — f = 0 means a flat/gradient-free frame
    * (callers filter, as in [[segmentPhashPairs]]). */
  def videoFramePhashes(df: DataFrame, idCol: String, binCol: String,
      maxFrames: Int = 32): DataFrame = {
    require(maxFrames > 0, s"maxFrames must be > 0, got $maxFrames")
    df.select(col(idCol).as("id"), col(binCol).as("b"))
      .filter(col("b").isNotNull && length(col("b")) > 0)
      .select(col("id"), posexplode(
        graft.functions.PhashNative.videoFrameGrids(col("b"), maxFrames)))
      .select(col("id"), col("pos").cast("long").as("frame_idx"),
        graft.functions.PhashNative.dhash56(col("col")).as("f"))
  }

  /** Per-payload motion profile over REAL decoded video frames: the L1
    * luma-grid distance between each consecutive frame pair — the
    * scene-cut / static-clip signal a video curation gate thresholds
    * (near-zero motion = a still shipped as video; a spike = a cut
    * boundary for segment sampling). Grids come from the same decode
    * seam as [[videoFramePhashes]]; the distance is exact integer
    * arithmetic over the 63 unsigned cell bytes (hex + conv per cell,
    * no UDF), and the consecutive pairing zips each payload's OWN grid
    * array (decode once, no join, no shuffle) — frame-grain, bounded by
    * `maxFrames` per payload. Single-frame payloads contribute no rows.
    * Output: (id, frame_a, frame_b = frame_a + 1, motion_l1). */
  def videoFrameMotion(df: DataFrame, idCol: String, binCol: String,
      maxFrames: Int = 32): DataFrame = {
    require(maxFrames > 0, s"maxFrames must be > 0, got $maxFrames")
    // consecutive pairing WITHOUT the round-14 self-join on
    // (id, frame_idx + 1): the join re-evaluated the full payload decode
    // on BOTH sides (the decode dominates — synthesis + GIF LZW per
    // frame) and paid an exchange; pairing frames of ONE row's grid
    // array instead decodes each payload once and never shuffles —
    // identical (id, frame_a, frame_b, motion_l1) rows.
    // Deliberately NO .filter on the payload/grids: predicate pushdown
    // substitutes the filter's aliases, so a size/length guard lands in
    // the stage BELOW the spread exchange with the whole synthesis+decode
    // expression inlined — a serial single-task re-decode of the corpus
    // (measured: most of the entry). The CASE inside the generator keeps
    // the semantics (null/empty/single-frame payloads emit no rows) while
    // everything expensive stays in the parallel post-exchange stage.
    val grids = df.select(col(idCol).as("id"),
        graft.functions.PhashNative.videoFrameGrids(col(binCol), maxFrames)
          .as("g"))
      .select(col("id"), posexplode(expr(
        """CASE WHEN size(g) >= 2 THEN
          |  transform(sequence(0, size(g) - 2),
          |    i -> struct(hex(g[i]) AS a_hx, hex(g[i + 1]) AS b_hx))
          |ELSE CAST(array() AS ARRAY<STRUCT<a_hx: STRING, b_hx: STRING>>)
          |END""".stripMargin)))
    val l1 = (0 until PerceptualHash.Cells).map { c =>
      s"abs(${byteAt("col.a_hx", (c + 1).toString)} - ${byteAt("col.b_hx", (c + 1).toString)})"
    }.mkString(" + ")
    grids.select(col("id"), col("pos").cast("long").as("frame_a"),
      (col("pos") + 1).cast("long").as("frame_b"),
      expr(s"CAST($l1 AS BIGINT)").as("motion_l1"))
  }

  /** Frame-level perceptual near-dup ACROSS payloads and WITHIN one (the
    * shared-intro / looped-content question, now over REAL decoded GIF
    * frames instead of byte segments): [[videoFramePhashes]] rows run the
    * same pigeonhole-complete chunk banding + exact Hamming verify as
    * [[segmentPhashPairs]], zero-fingerprint flood guard included.
    * Output: (id_a, frame_a, id_b, frame_b, hamming),
    * (id_a, frame_a) < (id_b, frame_b). */
  def videoFrameDupPairs(df: DataFrame, idCol: String, binCol: String,
      maxFrames: Int = 32, maxHamming: Int = 6): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= PerceptualHash.Chunks - 1,
      s"banded candidates are only complete for maxHamming <= " +
        s"${PerceptualHash.Chunks - 1}; got $maxHamming")
    val fp = videoFramePhashes(df, idCol, binCol, maxFrames)
      .filter(col("f") =!= 0L)
      .persist()
    fp.count()
    val chunks = fp.select(col("id"), col("frame_idx"), col("f"),
      explode(expr(PerceptualHash.sparkChunks("f"))).as("ck"))
    val out = chunks.as("a")
      .join(chunks.as("c"), col("a.ck") === col("c.ck") &&
        (col("a.id") < col("c.id") ||
          (col("a.id") === col("c.id") &&
            col("a.frame_idx") < col("c.frame_idx"))))
      .select(col("a.id").as("id_a"), col("a.frame_idx").as("frame_a"),
        col("c.id").as("id_b"), col("c.frame_idx").as("frame_b"),
        bit_count(col("a.f").bitwiseXOR(col("c.f"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .persist()
    out.count()
    fp.unpersist(false)
    out
  }
}

/** The dHash fingerprint constants + DuckDB-dialect mirror (the
  * [[graft.functions.HashExprs]] discipline: exact integer arithmetic,
  * generated from the same constants, so the oracle reproduces the Spark
  * side — [[graft.functions.PhashNative.DHash56]], a native expression —
  * bit-for-bit). 9×7 grid → 8 gradient bits per row × 7 rows = 56 bits —
  * deliberately < 63 so the fingerprint, its chunk extraction (div/mod)
  * and the XOR/bit_count verify all stay in nonnegative BIGINT range in
  * both engines (a 64-bit hash would put bit 63 in the sign position,
  * where arithmetic-shift / mod semantics diverge). */
object PerceptualHash {
  val GridW = 9
  val GridH = 7
  val Cells = GridW * GridH // 63
  val Bits = (GridW - 1) * GridH // 56
  val Chunks = 8
  val ChunkBits = Bits / Chunks // 7
  require(Chunks * ChunkBits == Bits)

  /** fingerprint → banded chunk keys (chunk index mixed in). */
  def sparkChunks(f: String): String =
    "array(" + (0 until Chunks).map { j =>
      s"((($f div ${1L << (ChunkBits * j)}L) % ${1 << ChunkBits}) * $Chunks + $j)"
    }.mkString(", ") + ")"

  private val HexDigits = "0123456789ABCDEF"

  def duckGridCells(hx: String, bn: String): String =
    s"""list_transform(range(0, $Cells), k ->
       |  CASE WHEN ((k + 1) * $bn) // $Cells > (k * $bn) // $Cells THEN
       |    list_reduce(list_prepend(0::BIGINT, list_transform(
       |      range((k * $bn) // $Cells, ((k + 1) * $bn) // $Cells),
       |      i -> (strpos('$HexDigits', $hx[CAST(2 * i + 1 AS INT)]) - 1) * 16
       |           + (strpos('$HexDigits', $hx[CAST(2 * i + 2 AS INT)]) - 1))),
       |      (acc, x) -> acc + x)
       |    // (((k + 1) * $bn) // $Cells - (k * $bn) // $Cells)
       |  ELSE 0::BIGINT END)""".stripMargin

  def duckDHashBits(cells: String): String =
    s"""list_reduce(list_prepend(0::BIGINT, list_transform(range(0, $Bits), b ->
       |  CASE WHEN $cells[CAST((b // 8) * $GridW + (b % 8) + 1 AS INT)] >
       |            $cells[CAST((b // 8) * $GridW + (b % 8) + 2 AS INT)]
       |  THEN (1::BIGINT << CAST(b AS INT)) ELSE 0::BIGINT END)),
       |  (acc, x) -> acc + x)""".stripMargin

  def duckChunks(f: String): String =
    "[" + (0 until Chunks).map { j =>
      s"((($f // ${1L << (ChunkBits * j)}) % ${1 << ChunkBits}) * $Chunks + $j)"
    }.mkString(", ") + "]"
}

/** The codec seam. Everything above this call is production plumbing;
  * this function is the marked stub. */
object MediaCodec {

  /** REAL image decode for PNG/JPEG via JDK ImageIO (java.desktop ships
    * with every JRE — no new dependency): decode, then area-average
    * grayscale-resample to the [[PerceptualHash]] 9×7 grid, one luma byte
    * per cell. Cell pixel spans use the same floor-division boundary rule
    * as the byte-span grid (`[c·w div 9, (c+1)·w div 9)`, widened to at
    * least one pixel for tiny images), luma is integer ITU-R 601
    * (`(299r + 587g + 114b) div 1000` — a pure-gray pixel maps to exactly
    * its gray value), and the cell value is the floor-mean over the span —
    * all integer math, deterministic for a given decoded bitmap.
    *
    * Returns None for non-image formats, truncated/corrupt payloads, or
    * anything ImageIO cannot decode — callers fall back to the byte-span
    * path, so a corrupt image degrades to the old behavior instead of
    * failing the job. */
  def decodeImageGrid(bytes: Array[Byte]): Option[Array[Byte]] = {
    if (bytes == null || bytes.length < 8) return None
    val fmt = Multimodal.sniffFormat(bytes)
    // gif included: ImageIO.read returns the FIRST stored frame of an
    // animated GIF, so a still/animated GIF gets a real image grid for
    // the feature/phash paths; the per-frame walk is [[decodeGifFrames]]
    if (fmt != "png" && fmt != "jpeg" && fmt != "gif") return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth < 1 || img.getHeight < 1) return None
      Some(lumaGrid(img))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** The shared 9×7 grayscale resample: integer cell boundaries, integer
    * luma (299/587/114 per mille), integer cell mean — deterministic on
    * any JVM, one pass per pixel. */
  private def lumaGrid(img: java.awt.image.BufferedImage): Array[Byte] = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Byte](PerceptualHash.Cells)
    var cy = 0
    while (cy < PerceptualHash.GridH) {
      val y0 = cy * h / PerceptualHash.GridH
      val y1 = math.min(h,
        math.max(y0 + 1, (cy + 1) * h / PerceptualHash.GridH))
      var cx = 0
      while (cx < PerceptualHash.GridW) {
        val x0 = cx * w / PerceptualHash.GridW
        val x1 = math.min(w,
          math.max(x0 + 1, (cx + 1) * w / PerceptualHash.GridW))
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            val luma = (299 * ((rgb >> 16) & 0xff) +
              587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
            sum += luma
            x += 1
          }
          y += 1
        }
        out(cy * PerceptualHash.GridW + cx) =
          (sum / ((x1 - x0).toLong * (y1 - y0))).toByte
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** REAL animated-GIF frame decode → per-frame 9×7 luma grids, bounded
    * to `maxFrames` — the first true VIDEO-frame path (GIF is the one
    * multi-frame container the JDK decodes without codec libraries; real
    * codecs stay behind [[decodeStub]]). Frames are the STORED rasters in
    * stream order (an optimized GIF's partial frames hash as stored —
    * deterministic, and identical stored frames still collide, which is
    * what frame-level dedup needs). None for non-GIF payloads or anything
    * the reader rejects; a GIF whose first frame decodes but whose k-th
    * is truncated yields the frames before the damage. */
  def decodeGifFrames(bytes: Array[Byte],
      maxFrames: Int): Option[Seq[Array[Byte]]] = {
    if (bytes == null || bytes.length < 8) return None
    if (Multimodal.sniffFormat(bytes) != "gif") return None
    var stream: javax.imageio.stream.ImageInputStream = null
    var reader: javax.imageio.ImageReader = null
    try {
      stream = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(stream)
      if (!readers.hasNext) return None
      reader = readers.next()
      reader.setInput(stream, false, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var i = 0
      var ok = true
      while (ok && i < maxFrames) {
        val frame =
          try Option(reader.read(i))
          catch { case scala.util.control.NonFatal(_) => None }
        frame match {
          case Some(img) if img.getWidth > 0 && img.getHeight > 0 =>
            buf += lumaGrid(img); i += 1
          case _ => ok = false
        }
      }
      if (buf.isEmpty) None else Some(buf.toSeq)
    } catch { case scala.util.control.NonFatal(_) => None }
    finally {
      if (reader != null) reader.dispose()
      if (stream != null)
        try stream.close()
        catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** REAL MJPEG-in-AVI video-frame decode → per-frame 9×7 luma grids,
    * bounded to `maxFrames` — the RIFF generalization of
    * [[decodeWavEnvelope]]'s chunk walk meeting [[decodeImageGrid]]'s
    * ImageIO JPEG path: walk the top-level RIFF 'AVI ' chunks to the
    * `LIST movi` payload, then walk its `##dc`/`##db` video chunks
    * (descending one level into `LIST rec ` interleave groups, where
    * capture tools put frames) and decode every JPEG-bearing one. MJPEG
    * is just concatenated baseline JPEGs, so this decode is as real as
    * ImageIO's; true inter-frame codecs (H.264/VP9) remain behind
    * [[decodeStub]]. None for non-AVI payloads or when no frame decodes;
    * a damaged k-th frame is skipped, not fatal (each JPEG is
    * independent — the MJPEG property). */
  def decodeAviFrames(bytes: Array[Byte],
      maxFrames: Int): Option[Seq[Array[Byte]]] = try {
    if (bytes == null || bytes.length < 12) return None
    if (Multimodal.sniffFormat(bytes) != "riff") return None
    def tag(o: Int): String =
      if (o + 4 > bytes.length) ""
      else new String(bytes.slice(o, o + 4), "US-ASCII")
    def u32(o: Int): Long = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    if (tag(8) != "AVI ") return None
    // top-level walk to LIST 'movi' (Long cursor: the WAV-walk guard
    // against a malformed size wrapping an Int cursor negative)
    var off = 12L
    var moviOff = -1L
    var moviEnd = -1L
    while (off + 8 <= bytes.length && moviOff < 0) {
      val o = off.toInt
      val sz = u32(o + 4)
      if (tag(o) == "LIST" && tag(o + 8) == "movi") {
        moviOff = o + 12L
        moviEnd = math.min(bytes.length.toLong, o + 8L + sz)
      }
      off += 8L + sz + (sz & 1L)
    }
    if (moviOff < 0) return None
    val buf = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def isVideoId(t: String): Boolean =
      t.length == 4 && t(0).isDigit && t(1).isDigit &&
        (t.endsWith("dc") || t.endsWith("db"))
    def walk(start: Long, end: Long, depth: Int): Unit = {
      var p = start
      while (p + 8 <= end && buf.size < maxFrames) {
        val o = p.toInt
        val t = tag(o)
        val sz = u32(o + 4)
        val dataEnd = math.min(end, o + 8L + sz)
        if (t == "LIST" && depth == 0 && tag(o + 8) == "rec ")
          walk(o + 12L, dataEnd, depth + 1)
        else if (isVideoId(t) && dataEnd - (o + 8) >= 4 &&
            (bytes(o + 8) & 0xff) == 0xff && (bytes(o + 9) & 0xff) == 0xd8)
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(
                bytes.slice(o + 8, dataEnd.toInt)))
            if (img != null && img.getWidth > 0 && img.getHeight > 0)
              buf += lumaGrid(img)
          } catch { case scala.util.control.NonFatal(_) => () }
        p += 8L + sz + (sz & 1L)
      }
    }
    walk(moviOff, moviEnd, 0)
    if (buf.isEmpty) None else Some(buf.toSeq)
  } catch { case scala.util.control.NonFatal(_) => None }

  /** The unified video-frame seam: GIF → [[decodeGifFrames]], AVI →
    * [[decodeAviFrames]] (MJPEG), anything else (true codecs) → None.
    * What [[graft.functions.PhashNative.videoFrameGrids]] evaluates. */
  def decodeVideoFrames(bytes: Array[Byte],
      maxFrames: Int): Option[Seq[Array[Byte]]] =
    if (bytes == null || bytes.length < 8) None
    else Multimodal.sniffFormat(bytes) match {
      case "gif" => decodeGifFrames(bytes, maxFrames)
      case "riff" => decodeAviFrames(bytes, maxFrames)
      case _ => None
    }

  /** REAL PCM WAV decode → [[PerceptualHash.Cells]]-window amplitude
    * envelope, the audio analog of [[decodeImageGrid]]'s luma grid: walk
    * the RIFF chunks (canonical "WAVE" + "fmt " + "data"; PCM format 1,
    * 16-bit only — anything else falls back like a corrupt image), fold
    * channels to mono frames, window the frames with the image grid's
    * integer boundaries, take mean |amplitude| per window, and normalize
    * to bytes by the loudest window — so a uniform gain change yields the
    * SAME envelope, and the downstream difference hash
    * ([[graft.functions.PhashNative]] over these cells) is volume-
    * invariant the way the image dHash is brightness-scale-invariant.
    * PCM needs no codec library: this decode is as real as ImageIO's.
    * None on anything malformed — callers degrade to the byte-span path.
    */
  def decodeWavEnvelope(bytes: Array[Byte]): Option[Array[Byte]] = try {
    if (bytes == null || bytes.length < 44) return None
    if (Multimodal.sniffFormat(bytes) != "riff") return None
    def tag(o: Int): String =
      if (o + 4 > bytes.length) ""
      else new String(bytes.slice(o, o + 4), "US-ASCII")
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    if (tag(8) != "WAVE") return None
    // off rides a Long: a malformed chunk size near u32-max would wrap an
    // Int cursor negative and index before the array — Long arithmetic
    // makes the loop guard terminate the walk instead.
    var off = 12L
    var channels = 0
    var dataOff = -1
    var dataLen = 0L
    while (off + 8 <= bytes.length && (channels == 0 || dataOff < 0)) {
      val o = off.toInt // off <= bytes.length here, so it fits an Int
      val t = tag(o)
      val sz = u32(o + 4)
      if (t == "fmt ") {
        if (o + 8 + 16 > bytes.length) return None
        if (u16(o + 8) != 1 || u16(o + 8 + 14) != 16) return None // PCM16
        channels = u16(o + 8 + 2)
        if (channels < 1) return None
      } else if (t == "data") {
        dataOff = o + 8
        dataLen = math.min(sz, (bytes.length - dataOff).toLong)
      }
      off += 8L + sz + (sz & 1L) // chunks are word-aligned; sz < 2^32
    }
    if (channels == 0 || dataOff < 0) return None
    val frames = (dataLen / (2L * channels)).toInt
    if (frames < 1) return None
    val cells = PerceptualHash.Cells
    val env = new Array[Long](cells)
    val cnt = new Array[Long](cells)
    var f = 0
    while (f < frames) {
      // channel-folded |amplitude| of frame f
      var s = 0L
      var c = 0
      while (c < channels) {
        val o = dataOff + 2 * (f * channels + c)
        val v = ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort.toInt
        s += math.abs(v.toLong)
        c += 1
      }
      val w = math.min(cells - 1, (f.toLong * cells / frames).toInt)
      env(w) += s / channels
      cnt(w) += 1
      f += 1
    }
    var mx = 0L
    var i = 0
    while (i < cells) {
      if (cnt(i) > 0) env(i) = env(i) / cnt(i)
      if (env(i) > mx) mx = env(i)
      i += 1
    }
    val out = new Array[Byte](cells)
    i = 0
    while (i < cells) {
      out(i) = if (mx == 0) 0 else (env(i) * 255 / mx).toByte
      i += 1
    }
    Some(out)
  } catch { case scala.util.control.NonFatal(_) => None }

  /** [[decodeWavStats]] silence threshold: 1% of 16-bit full scale. */
  val SilenceAbs = 328L

  /** [[decodeWavStats]] clipping threshold: |amplitude| at or above this
    * counts as clipped (just under full scale — real clipping rarely
    * pins the exact max). */
  val ClipAbs = 30000L

  /** REAL PCM WAV decode → integer signal statistics, the audio quality
    * scorecard next to [[decodeWavEnvelope]]'s perceptual envelope: a
    * curation pipeline gates audio shards on loudness (RMS), dynamic
    * range (peak), silence ratio, clipping, and spectral activity
    * (zero-crossing rate) before any expensive model sees the bytes.
    * Same canonical-RIFF walk and PCM16 contract as the envelope decode;
    * channels fold to a mono frame by truncating integer division (Java
    * `/` — exact and engine-independent; the declared oracle query uses
    * mono payloads so the fold is the identity there). All eight outputs
    * are exact longs — `Σm²` tops out at 2³⁰ per frame, so the sum
    * fails loud (never wraps silently) only past ~8·10⁹ frames, two
    * days of 48 kHz audio in ONE payload:
    * `[n_frames, channels, Σ|m|, Σm², max|m|, zero_crossings,
    *   silence_frames (|m| < [[SilenceAbs]]),
    *   clip_frames (|m| ≥ [[ClipAbs]])]`;
    * a zero crossing is a strict sign change (zero frames break a run —
    * +,0,+ does not cross). None on anything malformed. */
  def decodeWavStats(bytes: Array[Byte]): Option[Array[Long]] = try {
    if (bytes == null || bytes.length < 44) return None
    if (Multimodal.sniffFormat(bytes) != "riff") return None
    def tag(o: Int): String =
      if (o + 4 > bytes.length) ""
      else new String(bytes.slice(o, o + 4), "US-ASCII")
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    if (tag(8) != "WAVE") return None
    var off = 12L // Long cursor: malformed sizes must end the walk, not wrap
    var channels = 0
    var dataOff = -1
    var dataLen = 0L
    while (off + 8 <= bytes.length && (channels == 0 || dataOff < 0)) {
      val o = off.toInt
      val t = tag(o)
      val sz = u32(o + 4)
      if (t == "fmt ") {
        if (o + 8 + 16 > bytes.length) return None
        if (u16(o + 8) != 1 || u16(o + 8 + 14) != 16) return None // PCM16
        channels = u16(o + 8 + 2)
        if (channels < 1) return None
      } else if (t == "data") {
        dataOff = o + 8
        dataLen = math.min(sz, (bytes.length - dataOff).toLong)
      }
      off += 8L + sz + (sz & 1L)
    }
    if (channels == 0 || dataOff < 0) return None
    val frames = (dataLen / (2L * channels)).toInt
    if (frames < 1) return None
    var sumAbs = 0L
    var sumSq = 0L
    var maxAbs = 0L
    var zc = 0L
    var silence = 0L
    var clip = 0L
    var prev = 0L
    var f = 0
    while (f < frames) {
      var s = 0L
      var c = 0
      while (c < channels) {
        val o = dataOff + 2 * (f * channels + c)
        s += ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort.toInt
        c += 1
      }
      val m = s / channels
      val a = math.abs(m)
      sumAbs += a
      sumSq += m * m
      if (a > maxAbs) maxAbs = a
      if (f > 0 && ((m > 0 && prev < 0) || (m < 0 && prev > 0))) zc += 1
      if (a < SilenceAbs) silence += 1
      if (a >= ClipAbs) clip += 1
      prev = m
      f += 1
    }
    Some(Array(frames.toLong, channels.toLong, sumAbs, sumSq, maxAbs,
      zc, silence, clip))
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Audio stats over WAV, FLAC, G.711 (µ-law/A-law), or IMA ADPCM:
    * compressed payloads decode through [[FlacCodec]] /
    * [[CompandedWav]] and re-enter as canonical PCM16 WAV, so the
    * eight-long stats contract (and every gate built on it) is one
    * implementation. 16-bit FLAC only — the WAV path's own PCM16
    * contract. The two `orElse` arms are disjoint by construction: a
    * RIFF payload with fmt tag 1 takes the PCM door, tags 6/7/17 the
    * companded door, 'fLaC' magic the FLAC door. */
  def decodeAudioStats(bytes: Array[Byte]): Option[Array[Long]] =
    decodeWavStats(bytes)
      .orElse(FlacCodec.flacToWav(bytes).flatMap(decodeWavStats))
      .orElse(CompandedWav.toPcm16Wav(bytes).flatMap(decodeWavStats))

  /** [[decodeWavEnvelope]] over WAV, FLAC, G.711, or IMA ADPCM — the
    * volume-invariant perceptual envelope with the same compressed-audio
    * doors as [[decodeAudioStats]]. */
  def decodeAudioEnvelope(bytes: Array[Byte]): Option[Array[Byte]] =
    decodeWavEnvelope(bytes)
      .orElse(FlacCodec.flacToWav(bytes).flatMap(decodeWavEnvelope))
      .orElse(CompandedWav.toPcm16Wav(bytes).flatMap(decodeWavEnvelope))

  /** Feature vector: REAL signal statistics when the payload decodes —
    * image grid lumas (PNG/JPEG via ImageIO) or the WAV/FLAC amplitude
    * envelope — folded into `dim` lanes (same fold as the stub, over
    * decoded intensity instead of raw container bytes);
    * [[decodeStub]] otherwise. */
  def decode(bytes: Array[Byte], dim: Int): Array[Float] =
    decodeImageGrid(bytes).orElse(decodeAudioEnvelope(bytes)) match {
      case Some(grid) =>
        val out = new Array[Float](dim)
        var i = 0
        while (i < grid.length) {
          out(i % dim) = (out(i % dim) * 31f + (grid(i) & 0xff)) % 997f
          i += 1
        }
        out
      case None => decodeStub(bytes, dim)
    }

  /** STUB for formats with no in-JDK decode path — now ONLY true
    * inter-frame video codecs (H.264/VP9/AV1; this container ships no
    * media libraries): images, PCM WAV, FLAC ([[FlacCodec]]), animated
    * GIF, and MJPEG-AVI all have REAL decodes. Deterministic fake
    * features: a rolling
    * byte hash folded into `dim` float lanes. A real implementation
    * would decode and run an encoder here. */
  def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) {
        out(i % dim) = out(i % dim) * 31f + (bytes(i) & 0xff)
        out(i % dim) = out(i % dim) % 997f
        i += 1
      }
    }
    out
  }
}
