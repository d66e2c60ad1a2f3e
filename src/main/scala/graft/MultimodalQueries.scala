package graft

import graft.operators.Multimodal._

/** Multimodal-column inventory (SURVEY §7.6). The corpus is pure ASCII, so
  * the oracle recomputes byte-level results (lengths, hex slices, byte
  * histograms) with DuckDB string functions over the same text.
  */
object MultimodalQueries {

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q50_media_meta", (s, d) => mediaMeta(s, d), Some(
      """SELECT doc_id, 'text/plain' AS mime,
        |  CAST(n_chars AS BIGINT) AS n_bytes,
        |  md5(text) AS checksum,
        |  hex(encode(substr(text, 1, 8))) AS head_hex,
        |  array_to_string(list_transform(generate_series(1, CAST(n_chars AS INT), 64),
        |    i -> hex(encode(substr(text, i, 1)))), '') AS sample_hex
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // q112: CAS accounting — per-source blob-store economics (unique
    // blobs by checksum, bytes saved by content addressing).
    QueryDef("q112_cas_accounting", (s, d) => casAccounting(s, d), Some(
      """WITH b AS (
        |  SELECT source, md5(text) AS h, CAST(n_chars AS BIGINT) AS nb
        |  FROM documents),
        |g AS (
        |  SELECT source, h, COUNT(*) AS copies, MAX(nb) AS b
        |  FROM b GROUP BY source, h)
        |SELECT source,
        |  CAST(SUM(copies) AS BIGINT) AS n_blobs,
        |  CAST(SUM(copies * b) AS BIGINT) AS total_bytes,
        |  COUNT(*) AS n_unique,
        |  CAST(SUM(b) AS BIGINT) AS unique_bytes,
        |  CAST(SUM(copies * b) - SUM(b) AS BIGINT) AS saved_bytes
        |FROM g GROUP BY source ORDER BY source""".stripMargin)),

    QueryDef("q51_frame_sample", (s, d) => frameSample(s, d), Some(
      """SELECT doc_id,
        |  CAST((i - 1) // 64 AS BIGINT) AS frame_no,
        |  CAST(i AS BIGINT) AS off,
        |  hex(encode(substr(text, i, 16))) AS frame_hex
        |FROM (
        |  SELECT doc_id, text,
        |    unnest(list_filter(generate_series(1, CAST(n_chars AS INT), 64),
        |      i -> i + 15 <= n_chars)) AS i
        |  FROM documents)
        |WHERE (i - 1) // 64 < 4
        |ORDER BY doc_id, frame_no""".stripMargin)),

    QueryDef("q53_resize", (s, d) => resize(s, d), Some(
      """SELECT doc_id,
        |  CAST(n_chars AS BIGINT) AS orig_bytes,
        |  CAST((n_chars + 3) // 4 AS BIGINT) AS resized_bytes,
        |  md5(array_to_string(list_transform(
        |    generate_series(1, CAST(n_chars AS INT), 4),
        |    i -> substr(text, i, 1)), '')) AS resized_md5
        |FROM documents ORDER BY doc_id""".stripMargin)),

    QueryDef("q52_byte_histogram", (s, d) => byteHistogram(s, d), Some(
      """SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS n_bytes
        |FROM (
        |  SELECT source,
        |    unnest(list_transform(generate_series(1, CAST(n_chars AS INT)),
        |      i -> ascii(substr(text, i, 1)) // 16)) AS bucket
        |  FROM documents)
        |GROUP BY source, bucket ORDER BY source, bucket""".stripMargin))
  )
}
