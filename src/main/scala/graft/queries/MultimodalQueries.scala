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
        .select(col("doc_id"), col("byte_len"), col("format"))
    }, Some("""
      SELECT doc_id, octet_length(encode(text)) AS byte_len,
             'unknown' AS format
      FROM documents""")),

    // frame sampling: every 64th byte, max 8 "frames" — deterministic byte
    // positions; output is frame count + first-frame byte (array<binary>
    // itself isn't hash-comparable across engines)
    Q("mm_frames", (s, d) => {
      val bin = t(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("media"))
      Multimodal.frameSample(bin, "media", 64, 8)
        .select(col("doc_id"), size(col("frames")).as("n_frames"),
          ascii(element_at(col("frames"), 1).cast("string")).as("first_frame_byte"))
    }, Some("""
      SELECT doc_id,
             least(octet_length(encode(text)) // 64, 7) + 1 AS n_frames,
             ascii(text[1]) AS first_frame_byte
      FROM documents""")))
}
