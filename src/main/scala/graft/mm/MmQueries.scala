package graft.mm

import graft.{Reg, Tables}
import org.apache.spark.sql.functions._

/** Graded multimodal-plumbing queries. The binary payload is the UTF-8
  * encoding of `documents.text` (the fixtures ship no real media); the
  * decode step is a deterministic stub (see MultiModal), the binary
  * schema/partition plumbing is real. Oracles recompute the byte stats
  * from the text in DuckDB (ASCII corpus ⇒ bytes ≡ chars, verified
  * FIXTURES-side: 0 docs where octet_length ≠ length). */
object MmQueries {

  val all: Seq[Reg] = Seq(

    // ---- per-partition feature extraction over a binary column ----------
    Reg("mm_binary_features",
      (s, dir) => MultiModal.extractFeatures(
          Tables(s, dir).documents.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")))
        .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INT) AS n_bytes,
               md5(text) AS content_md5,
               CAST(ascii(substr(text, 1, 1)) AS INT) AS head_cp,
               CAST((octet_length(encode(text)) - 1) // 16 + 1 AS INT) AS n_frames
        FROM documents ORDER BY doc_id
      """)),

    // ---- same features through the imperative per-partition codec seam --
    // (the mapPartitions RDD hop a REAL image/audio codec drops into,
    // MultiModal.extractFeaturesViaCodec): graded by the IDENTICAL oracle
    // as mm_binary_features, proving the iterator-in/iterator-out seam
    // end to end — schema, row conversion, partition iteration — not just
    // declaring it. Kept separate from the columnar path, which remains
    // the recommended (codegen, zero-RDD-hop) formulation.
    Reg("mm_binary_features_codec",
      (s, dir) => MultiModal.extractFeaturesViaCodec(
          Tables(s, dir).documents.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")))
        .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INT) AS n_bytes,
               md5(text) AS content_md5,
               CAST(ascii(substr(text, 1, 1)) AS INT) AS head_cp,
               CAST((octet_length(encode(text)) - 1) // 16 + 1 AS INT) AS n_frames
        FROM documents ORDER BY doc_id
      """)),

    // ---- same features through the Arrow COLUMNAR batch seam ------------
    // (MultiModal.extractFeaturesViaArrow): rows gathered into real Arrow
    // vectors, decoder runs per-batch over the vectors — the mapInArrow-
    // shaped seam a vectorized/JNI codec plugs into. Same oracle as the
    // other two seams: all three multimodal codec tiers (columnar
    // expressions / row iterator / Arrow batches) are hash-graded
    // against one truth.
    Reg("mm_binary_features_arrow",
      (s, dir) => MultiModal.extractFeaturesViaArrow(
          Tables(s, dir).documents.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")))
        .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INT) AS n_bytes,
               md5(text) AS content_md5,
               CAST(ascii(substr(text, 1, 1)) AS INT) AS head_cp,
               CAST((octet_length(encode(text)) - 1) // 16 + 1 AS INT) AS n_frames
        FROM documents ORDER BY doc_id
      """)),

    // ---- fixed-stride frame sampling over binary ------------------------
    Reg("mm_frame_sample",
      (s, dir) => MultiModal.sampleFrames(
          Tables(s, dir).documents.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")),
          stride = 16, maxFrames = 3)
        .orderBy("doc_id", "frame_idx"),
      Some("""
        WITH f AS (SELECT doc_id, text, unnest(range(0,
                     least((length(text) - 1) // 16 + 1, 3))) AS frame_idx
                   FROM documents)
        SELECT doc_id, frame_idx,
               md5(substr(text, frame_idx * 16 + 1, 16)) AS frame_md5
        FROM f ORDER BY doc_id, frame_idx
      """))
  )
}
