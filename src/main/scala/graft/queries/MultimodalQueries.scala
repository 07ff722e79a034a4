package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal-column queries: binary payload metadata + frame sampling.
  * The documents' text bytes stand in for media payloads (no media libs in
  * the container); the binary plumbing is identical for real payloads. */
object MultimodalQueries {
  import Tables.t

  /** The dHash pair pipeline as a reusable CTE chain ending in
    * `pp(id_a, id_b, hamming)` — shared by mm_phash_dedup and the
    * caption-join composition (the minhashPairCtes pattern). */
  private val phashPairCtes: String = {
    import graft.operators.PerceptualHash
    s"""b AS (SELECT doc_id, hex(encode(text)) AS hx,
       |             octet_length(encode(text)) AS bn
       |      FROM documents
       |      WHERE text IS NOT NULL AND octet_length(encode(text)) > 0),
       |c AS (SELECT doc_id, ${PerceptualHash.duckGridCells("hx", "bn")} AS cells
       |      FROM b),
       |f AS (SELECT doc_id, ${PerceptualHash.duckDHashBits("cells")} AS f
       |      FROM c),
       |ck AS (SELECT doc_id, f, unnest(${PerceptualHash.duckChunks("f")}) AS ck
       |       FROM f),
       |pp AS (SELECT DISTINCT a.doc_id AS id_a, c2.doc_id AS id_b,
       |         CAST(bit_count(xor(a.f, c2.f)) AS BIGINT) AS hamming
       |       FROM ck a JOIN ck c2 ON a.ck = c2.ck AND a.doc_id < c2.doc_id
       |       WHERE bit_count(xor(a.f, c2.f)) <= 6)""".stripMargin
  }

  def defs: Seq[Q] = Seq(
    Q("mm_meta", (s, d) => {
      val bin = t(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("media"))
      Multimodal.withMediaMeta(bin, "media")
        .select(col("doc_id"), col("byte_len").cast("long").as("byte_len"), col("format"))
    }, Some("""
      SELECT doc_id, octet_length(encode(text)) AS byte_len,
             'unknown' AS format
      FROM documents""")),

    // the loader end-to-end AS an oracle-checked query: replay documents as
    // Singer JSONL through parse -> type -> flatten -> parquet, read the
    // landed table back; a hash match against the source table proves the
    // ingest path is content-faithful
    Q("q34_loader_roundtrip", (s, d) => {
      val docs = t(s, d, "documents")
      val out = java.nio.file.Files.createTempDirectory("rt-out").toString
      val schemaLine =
        """{"type": "SCHEMA", "stream": "documents", "schema": {"type": "object", "properties": {
          |"doc_id": {"type": ["integer", "null"]}, "text": {"type": ["string", "null"]},
          |"lang": {"type": ["string", "null"]}, "source": {"type": ["string", "null"]},
          |"n_chars": {"type": ["integer", "null"]}}}}"""
          .stripMargin.replaceAll("\n", "")
      // distributed dump: records written by executors, only the one-line
      // SCHEMA file comes from the driver — no collect at any scale
      val spool = java.nio.file.Files.createTempDirectory("rt-spool").toString
      docs.selectExpr(
        """concat('{"type": "RECORD", "stream": "documents", "record": ', to_json(struct(*)), '}') AS value""")
        .write.mode("overwrite").text(spool)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(spool, "0_schema.jsonl"), schemaLine + "\n")
      graft.loader.SingerLoader.loadFile(s, spool,
        graft.core.GraftConfig(hdfsDestinationPath = out,
          compressionMethod = "snappy", skipExistingFiles = true,
          maxRecordsPerFile = 10000))
      s.read.parquet(s"$out/documents")
    }, Some("SELECT * FROM documents")),

    // the Singer BATCH surface AS an oracle-checked query: spool documents
    // as raw JSONL batch files (executor-written, driver only lists the
    // spool dir for the manifest), feed one SCHEMA + one BATCH message, and
    // read the landed table back — a hash match against the source proves
    // manifest ingest is byte-faithful to the RECORD path (q34 proves the
    // RECORD path against the same oracle)
    Q("q69_batch_ingest", (s, d) => {
      val docs = t(s, d, "documents")
      val out = java.nio.file.Files.createTempDirectory("batch-out").toString
      val spool = java.nio.file.Files.createTempDirectory("batch-spool").toString
      docs.selectExpr("to_json(struct(*)) AS value")
        .write.mode("overwrite").text(spool)
      val manifest = new java.io.File(spool).listFiles()
        .filter(_.getName.startsWith("part-"))
        .map(f => "file://" + f.getAbsolutePath).sorted
      val schemaLine =
        """{"type": "SCHEMA", "stream": "documents", "schema": {"type": "object", "properties": {
          |"doc_id": {"type": ["integer", "null"]}, "text": {"type": ["string", "null"]},
          |"lang": {"type": ["string", "null"]}, "source": {"type": ["string", "null"]},
          |"n_chars": {"type": ["integer", "null"]}}}}"""
          .stripMargin.replaceAll("\n", "")
      val batchLine =
        s"""{"type": "BATCH", "stream": "documents", "encoding": {"format": "jsonl", "compression": "none"}, "manifest": ${manifest.map("\"" + _ + "\"").mkString("[", ", ", "]")}}"""
      val ctl = java.nio.file.Files.createTempDirectory("batch-ctl")
      java.nio.file.Files.writeString(ctl.resolve("input.jsonl"),
        schemaLine + "\n" + batchLine + "\n")
      graft.loader.SingerLoader.loadFile(s, ctl.toString,
        graft.core.GraftConfig(hdfsDestinationPath = out,
          compressionMethod = "snappy", skipExistingFiles = true,
          maxRecordsPerFile = 10000))
      s.read.parquet(s"$out/documents")
    }, Some("SELECT * FROM documents")),

    // perceptual-hash near-dup over the binary payloads — the mm_ analog
    // of dedup_simhash: 56-bit dHash (9x7 mean-byte grid -> horizontal
    // gradient bits), 8 banded 7-bit chunks for candidates (pigeonhole-
    // complete at ham <= 7), exact Hamming verify. The oracle replays the
    // identical integer pipeline from the shared PerceptualHash constants.
    Q("mm_phash_dedup", (s, d) => {
      val bin = Tables.ts(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("media"))
      Multimodal.phashPairs(bin, "doc_id", "media", maxHamming = 6)
    }, Some(s"""
      WITH $phashPairCtes
      SELECT id_a, id_b, hamming FROM pp""")),

    // caption/image JOINT filtering: phash near-dup pairs close into
    // clusters (min-label = recursive-CTE closure in the oracle) and each
    // image cluster keeps its best-CAPTION member (longest caption,
    // id tie-break) — "same picture, many captions: keep the richest one",
    // the multimodal analog of dedup_best_rep
    Q("mm_phash_best_caption", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.ts(s, d, "documents")
      val bin = docs.select(col("doc_id"), col("text").cast("binary").as("media"))
      val pairs = Multimodal.phashPairs(bin, "doc_id", "media", maxHamming = 6)
        .select(col("id_a"), col("id_b"))
      val cl = graft.operators.Dedup.connectedComponents(
        docs.select(col("doc_id").as("id")), pairs)
      val w = Window.partitionBy(col("cluster"))
        .orderBy(col("cap_len").desc, col("id").asc)
      cl.join(docs.select(col("doc_id").as("id"),
          length(col("text")).cast("long").as("cap_len")), "id")
        .withColumn("rn", row_number().over(w))
        .withColumn("n_members",
          count(lit(1)).over(Window.partitionBy(col("cluster"))))
        .filter(col("rn") === 1)
        .select(col("cluster"), col("id").as("kept_id"),
          col("cap_len").as("kept_cap_len"), col("n_members"))
    }, Some(s"""
      WITH RECURSIVE $phashPairCtes,
      edges AS (SELECT id_a AS src, id_b AS dst FROM pp
                UNION ALL SELECT id_b, id_a FROM pp),
      reach(src, dst) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      lbl AS (SELECT src AS id, min(dst) AS cluster FROM reach GROUP BY src),
      m AS (SELECT cluster, id, length(d.text) AS cap_len,
              row_number() OVER (PARTITION BY cluster
                ORDER BY length(d.text) DESC, id ASC) AS rn,
              count(*) OVER (PARTITION BY cluster) AS n_members
            FROM lbl JOIN documents d ON lbl.id = d.doc_id)
      SELECT cluster, id AS kept_id, CAST(cap_len AS BIGINT) AS kept_cap_len,
             n_members
      FROM m WHERE rn = 1""")),

    // REAL container-header parsing (no decode, no stub): synthetic
    // PNG / JPEG / WAV headers are constructed from doc fields, parsed
    // back by the engine's hex-arithmetic projection (incl. the bounded
    // JPEG SOF-marker walk), and the oracle asserts the parsed values
    // equal the generating ground truth — a construct→parse roundtrip
    Q("mm_media_headers", (s, d) => {
      val docs = Tables.ts(s, d, "documents")
        .select(col("doc_id"), col("n_chars"))
      // LE byte-string helpers for the WAV fields
      def le16(v: String) =
        s"concat(lpad(hex(($v) % 256), 2, '0'), lpad(hex(($v) div 256), 2, '0'))"
      def le32(v: String) =
        s"concat(lpad(hex(($v) % 256), 2, '0'), lpad(hex((($v) div 256) % 256), 2, '0'), " +
          s"lpad(hex((($v) div 65536) % 256), 2, '0'), lpad(hex((($v) div 16777216) % 256), 2, '0'))"
      val media = expr(s"""unhex(CASE CAST(doc_id % 3 AS INT)
        |  WHEN 0 THEN concat('89504E470D0A1A0A', '0000000D', '49484452',
        |    lpad(hex((doc_id % 1000) + 1), 8, '0'),
        |    lpad(hex((n_chars % 500) + 1), 8, '0'), '08060000')
        |  WHEN 1 THEN concat('FFD8', 'FFE000044A46', 'FFC0001108',
        |    lpad(hex((n_chars % 400) + 1), 4, '0'),
        |    lpad(hex((doc_id % 300) + 1), 4, '0'),
        |    '03012200021101031101')
        |  ELSE concat('52494646', '24000000', '57415645', '666D7420',
        |    '10000000', '0100', ${le16("1 + doc_id % 2")},
        |    ${le32("8000 + (n_chars % 100) * 100")})
        |END)""".stripMargin)
      Multimodal.withMediaHeaders(
          docs.withColumn("media", media), "media")
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          col("channels"), col("sample_rate"))
    }, Some("""
      SELECT doc_id,
        CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
             ELSE 'riff' END AS format,
        CASE doc_id % 3 WHEN 0 THEN (doc_id % 1000) + 1
             WHEN 1 THEN (doc_id % 300) + 1
             ELSE NULL END AS width,
        CASE doc_id % 3 WHEN 0 THEN (n_chars % 500) + 1
             WHEN 1 THEN (n_chars % 400) + 1
             ELSE NULL END AS height,
        CASE doc_id % 3 WHEN 2 THEN 1 + doc_id % 2 ELSE NULL END AS channels,
        CASE doc_id % 3 WHEN 2 THEN 8000 + (n_chars % 100) * 100
             ELSE NULL END AS sample_rate
      FROM documents""")),

    // frame sampling: every 64th byte, max 8 "frames" — deterministic byte
    // positions; output is frame count + first-frame byte (array<binary>
    // itself isn't hash-comparable across engines)
    Q("mm_frames", (s, d) => {
      val bin = t(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("media"))
      Multimodal.frameSample(bin, "media", 64, 8)
        .select(col("doc_id"), size(col("frames")).cast("long").as("n_frames"),
          ascii(element_at(col("frames"), 1).cast("string")).as("first_frame_byte"))
    }, Some("""
      SELECT doc_id,
             least((octet_length(encode(text)) + 63) // 64, 8) AS n_frames,
             ascii(text[1]) AS first_frame_byte
      FROM documents""")),

    // SEGMENT-level perceptual dedup — the video/scene analog of
    // mm_phash_dedup: each payload cut into 4 contiguous byte segments,
    // each segment dHashed independently, near-dup segments found across
    // payloads AND within one (shared intros, loops). Zero-fingerprint
    // segments (no gradient signal) are dropped on both sides — the
    // degenerate-bucket flood guard.
    Q("mm_segment_dedup", (s, d) => {
      val bin = Tables.ts(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("media"))
      Multimodal.segmentPhashPairs(bin, "doc_id", "media",
        nSegs = 4, maxHamming = 6)
    }, Some {
      import graft.operators.PerceptualHash
      s"""
      WITH b AS (SELECT doc_id, hex(encode(text)) AS hxf,
                   octet_length(encode(text)) AS bn
                 FROM documents
                 WHERE text IS NOT NULL AND octet_length(encode(text)) > 0),
      sg AS (SELECT doc_id, seg, (seg * bn) // 4 AS st,
               ((seg + 1) * bn) // 4 AS en, hxf
             FROM b CROSS JOIN range(0, 4) t(seg)
             WHERE ((seg + 1) * bn) // 4 > (seg * bn) // 4),
      sb AS (SELECT doc_id, seg,
               substring(hxf, CAST(2 * st + 1 AS INT),
                 CAST(2 * (en - st) AS INT)) AS hx,
               en - st AS bn
             FROM sg),
      c AS (SELECT doc_id, seg,
              ${PerceptualHash.duckGridCells("hx", "bn")} AS cells
            FROM sb),
      f0 AS (SELECT doc_id, seg,
               ${PerceptualHash.duckDHashBits("cells")} AS f
             FROM c),
      f AS (SELECT * FROM f0 WHERE f <> 0),
      ck AS (SELECT doc_id, seg, f,
               unnest(${PerceptualHash.duckChunks("f")}) AS ck
             FROM f),
      pp AS (SELECT DISTINCT a.doc_id AS id_a, a.seg AS seg_a,
               c2.doc_id AS id_b, c2.seg AS seg_b,
               CAST(bit_count(xor(a.f, c2.f)) AS BIGINT) AS hamming
             FROM ck a JOIN ck c2 ON a.ck = c2.ck
               AND (a.doc_id < c2.doc_id
                    OR (a.doc_id = c2.doc_id AND a.seg < c2.seg))
             WHERE bit_count(xor(a.f, c2.f)) <= 6)
      SELECT id_a, seg_a, id_b, seg_b, hamming FROM pp"""
    }))
}
