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

  /** Branch-coverage rows for the WET derivation: (doc_id, raw text,
    * expected HTML-rendered text). The corpus rows are plain prose
    * (single-spaced, no markup — measured; a regen re-measures per the
    * verify skill), so these planted rows are what exercise the
    * rendering branches where derived ≠ raw: whitespace collapse,
    * entity decode, inline-tag strip, edge trim. The EXPECTED strings
    * are literals shared verbatim with the oracle SQL — only a real
    * HTML render inside the WARC walk can reproduce them. */
  private[queries] val derivePlanted: Seq[(Long, String, String)] = Seq(
    (10000001L, "a  b  c", "a b c"),
    (10000002L, "x &amp; y", "x & y"),
    (10000003L, "pre <b>mid</b> post", "pre mid post"),
    (10000004L, "done &hellip; now", "done … now"),
    (10000005L, "  padded ends  ", "padded ends"))

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
    }),

    // WET → curation in ONE plan — the Common-Crawl-shaped pipeline:
    // walk the .wet.gz shard, decode each surviving conversion record's
    // text, and run the full Gopher rule frame over the records. The
    // shard bytes and the decoded text stay in the same narrow 1→N
    // stage (no shuffle until the final presentation sort); corrupt
    // members drop at the gzip layer exactly as in q_wet_text. Each
    // record gets the synthetic id doc_id*2+member_idx so the Gopher
    // frame's per-document contract applies per record.
    "q_wet_funnel" -> ((s, d) => {
      val withBin = Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .withColumn("payload",
          graft.ext.Warc.wetGzPlantedCol(col("text"), col("doc_id"), 101))
      val recs = graft.ext.Warc.wetRecordText(withBin, "doc_id", "payload")
        .toDF()
        .filter(col("ok"))
        .select((col("doc_id") * 2 + col("member_idx")).cast("long").as("doc_id"),
          col("rec_text").as("text"))
      graft.ext.CurationFilters.gopherFrame(recs, "text")
        .orderBy(col("doc_id"))
    }),

    // The WARC→WET derivation — what produced the WET sibling of every
    // Common Crawl shard: response record → strip HTTP head → render
    // HTML to text → compare with the conversion record. Corpus rows ∪
    // the planted rendering-branch rows; doc_id % 101 response records
    // are digest-corrupt and must degrade to the error row while the
    // conversion payload still reports. One narrow map pass.
    "q_warc_derive_wet" -> ((s, d) => {
      import s.implicits._
      val in = Tables.documents(s, d).select(col("doc_id"), col("text"))
        .unionByName(derivePlanted.map { case (id, t, _) => (id, t) }
          .toDF("doc_id", "text"))
        .withColumn("payload",
          graft.ext.Warc.warcPlantedCol(col("text"), col("doc_id"), 101))
      graft.ext.Warc.deriveWet(in, "doc_id", "payload")
        .toDF()
        .orderBy(col("doc_id"))
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
        |FROM m ORDER BY doc_id, member_idx""".stripMargin,

    // Rebuilds the surviving slices with the same substr algebra as
    // q_wet_text, then applies the shared Gopher SQL mirror per record.
    "q_wet_funnel" ->
      s"""WITH d AS (SELECT doc_id, coalesce(text,'') AS t,
         |                  length(coalesce(text,'')) AS n
         |           FROM documents),
         |rel AS (SELECT CAST(doc_id * 2 + i AS BIGINT) AS doc_id,
         |          CASE WHEN i = 0 THEN substr(t, 1, n // 2)
         |               ELSE substr(t, n // 2 + 1) END AS text
         |        FROM d, (SELECT unnest(range(2)) AS i)
         |        WHERE NOT (doc_id % 101 = 0 AND i = 0)),
         |res AS (
         |${graft.ext.CurationFilters.gopherSql("rel")})
         |SELECT * FROM res ORDER BY doc_id""".stripMargin,

    // Corpus rows mirror the renderer's whitespace collapse (the only
    // branch plain prose can hit — RE2's \s and Java's isWhitespace
    // agree on ASCII space, the corpus's only whitespace); the planted
    // rows' expected derivations are shared literals. The corrupt
    // formula mirrors warcPlantedCol's digest damage.
    "q_warc_derive_wet" -> {
      val plantedRows = derivePlanted.map { case (id, t, _) =>
        s"(CAST($id AS BIGINT), '${t.replace("'", "''")}')"
      }.mkString(",\n    ")
      val expRows = derivePlanted.map { case (id, _, e) =>
        s"(CAST($id AS BIGINT), '${e.replace("'", "''")}')"
      }.mkString(",\n    ")
      s"""WITH d AS (
         |  SELECT doc_id, coalesce(text,'') AS t FROM documents
         |  UNION ALL
         |  SELECT * FROM (VALUES
         |    $plantedRows) AS p(doc_id, t)),
         |e AS (SELECT * FROM (VALUES
         |    $expRows) AS q(doc_id, exp)),
         |m AS (SELECT d.doc_id, d.t,
         |        coalesce(e.exp,
         |          trim(regexp_replace(d.t, '\\s+', ' ', 'g'))) AS der
         |      FROM d LEFT JOIN e ON d.doc_id = e.doc_id)
         |SELECT doc_id,
         |  NOT (doc_id % 101 = 0) AS response_ok,
         |  CASE WHEN doc_id % 101 = 0 THEN '' ELSE md5(der) END AS derived_md5,
         |  md5(t) AS wet_md5,
         |  CASE WHEN doc_id % 101 = 0 THEN false ELSE der = t END AS derived_eq_wet
         |FROM m ORDER BY doc_id""".stripMargin
    }
  )
}
