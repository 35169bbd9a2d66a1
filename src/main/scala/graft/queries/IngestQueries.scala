package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shard-container ingestion queries — the WARC/WET (ISO 28500) family
  * (see [[graft.ext.Warc]]), the S1-equivalent source for the 100 TB
  * web-corpus north star. Each query plants a byte-exact container
  * column from the documents table (the gzip/tar/zip precedent) and
  * walks it back with the real parser, so the DuckDB oracle can
  * predict every emitted field analytically — only a correct
  * header-parse + digest-verify + resync walk can match.
  */
object IngestQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // WARC record walk (ISO 28500): each doc packed as a 3-record
    // stream — warcinfo, response (minimal HTTP response wrapping the
    // text in HTML), conversion (plain text, the WET shape). Every
    // 101st doc's response record has its last payload byte flipped
    // AFTER the WARC-Block-Digest was computed: the walker must fail
    // THAT record on the digest and resync on Content-Length, keeping
    // records 0 and 2 — per-record isolation, not whole-stream loss.
    // Map-only 1→N; the stream bytes never shuffle.
    "q_warc_members" -> ((s, d) => {
      val withBin = Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .withColumn("payload",
          graft.ext.Warc.warcPlantedCol(col("text"), col("doc_id"), 101))
      graft.ext.Warc.recordMeta(withBin, "doc_id", "payload")
        .toDF()
        .orderBy(col("doc_id"), col("member_idx"))
    }),

    // WET text extraction through the .wet.gz framing: each doc's text
    // in two half slices, each a conversion record in ITS OWN gzip
    // member (the framing that makes WARC splittable at scale — any
    // worker can start at a member boundary). Every 101st doc's member
    // 0 has its gzip CRC trailer flipped: the MEMBER layer must fail it
    // while member 1 still inflates AND parses — the two walkers
    // compose with per-member error isolation. Map-only 1→N.
    "q_wet_text" -> ((s, d) => {
      val withBin = Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .withColumn("payload",
          graft.ext.Warc.wetGzPlantedCol(col("text"), col("doc_id"), 101))
      graft.ext.Warc.wetRecordMeta(withBin, "doc_id", "payload")
        .toDF()
        .orderBy(col("doc_id"), col("member_idx"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    // Rebuilds the three planted payload strings (CRLFs via
    // chr(13)||chr(10)) and predicts every walker field analytically;
    // strlen() = UTF-8 byte count = the record's Content-Length.
    "q_warc_members" ->
      """WITH d AS (SELECT doc_id, coalesce(text,'') AS t FROM documents),
        |m AS (SELECT doc_id, t, i,
        |        (doc_id % 101 = 0 AND i = 1) AS corrupt
        |      FROM d, (SELECT unnest(range(3)) AS i)),
        |p AS (SELECT doc_id, i, corrupt,
        |        CASE i
        |          WHEN 0 THEN 'software: graft/1.0' || chr(13)||chr(10) ||
        |                 'format: WARC File Format 1.0' || chr(13)||chr(10)
        |          WHEN 1 THEN 'HTTP/1.1 200 OK' || chr(13)||chr(10) ||
        |                 'Content-Type: text/html; charset=utf-8' ||
        |                 chr(13)||chr(10)||chr(13)||chr(10) ||
        |                 '<html><body><p>' || t || '</p></body></html>'
        |          ELSE t END AS payload
        |      FROM m)
        |SELECT doc_id, CAST(i AS INT) AS member_idx,
        |  CASE WHEN corrupt THEN ''
        |       ELSE CASE i WHEN 0 THEN 'warcinfo' WHEN 1 THEN 'response'
        |            ELSE 'conversion' END END AS warc_type,
        |  CASE WHEN corrupt OR i = 0 THEN ''
        |       ELSE 'https://example.com/doc/' || CAST(doc_id AS VARCHAR)
        |       END AS target_uri,
        |  NOT corrupt AS ok,
        |  CASE WHEN corrupt THEN 0
        |       ELSE CAST(strlen(payload) AS BIGINT) END AS n_bytes,
        |  CASE WHEN corrupt THEN '' ELSE md5(payload) END AS payload_md5
        |FROM p ORDER BY doc_id, member_idx""".stripMargin,

    // Two half slices by CHARACTER count (a = length/2; slice 2 takes
    // the remainder) — strlen(part) gives the decoded payload's byte
    // length; doc_id % 101 = 0 corrupts member 0 at the gzip layer.
    "q_wet_text" ->
      """WITH d AS (SELECT doc_id, coalesce(text,'') AS t,
        |                  length(coalesce(text,'')) AS n
        |           FROM documents),
        |m AS (SELECT doc_id, i,
        |        CASE WHEN i = 0 THEN substr(t, 1, n // 2)
        |             ELSE substr(t, n // 2 + 1) END AS part,
        |        (doc_id % 101 = 0 AND i = 0) AS corrupt
        |      FROM d, (SELECT unnest(range(2)) AS i))
        |SELECT doc_id, CAST(i AS INT) AS member_idx,
        |  CASE WHEN corrupt THEN '' ELSE 'conversion' END AS warc_type,
        |  CASE WHEN corrupt THEN ''
        |       ELSE 'https://example.com/doc/' || CAST(doc_id AS VARCHAR)
        |       END AS target_uri,
        |  NOT corrupt AS ok,
        |  CASE WHEN corrupt THEN 0
        |       ELSE CAST(strlen(part) AS BIGINT) END AS n_bytes,
        |  CASE WHEN corrupt THEN '' ELSE md5(part) END AS payload_md5
        |FROM m ORDER BY doc_id, member_idx""".stripMargin
  )
}
