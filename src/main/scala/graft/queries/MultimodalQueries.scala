package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal-column queries: binary payload metadata + frame sampling.
  * The documents' text bytes stand in for media payloads (no media libs in
  * the container); the binary plumbing is identical for real payloads. */
object MultimodalQueries {
  import Tables.t

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
    }, Some {
      import graft.operators.PerceptualHash
      s"""
      WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
                        octet_length(encode(text)) AS bn
                 FROM documents
                 WHERE text IS NOT NULL AND octet_length(encode(text)) > 0),
      c AS (SELECT doc_id, ${PerceptualHash.duckGridCells("hx", "bn")} AS cells
            FROM b),
      f AS (SELECT doc_id, ${PerceptualHash.duckDHashBits("cells")} AS f
            FROM c),
      ck AS (SELECT doc_id, f, unnest(${PerceptualHash.duckChunks("f")}) AS ck
             FROM f)
      SELECT DISTINCT a.doc_id AS id_a, c2.doc_id AS id_b,
             CAST(bit_count(xor(a.f, c2.f)) AS BIGINT) AS hamming
      FROM ck a JOIN ck c2 ON a.ck = c2.ck AND a.doc_id < c2.doc_id
      WHERE bit_count(xor(a.f, c2.f)) <= 6"""
    }),

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
      FROM documents""")))
}
