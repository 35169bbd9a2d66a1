package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Sentiment, Udfs}
import graft.pipeline.{DocPipeline, Router}

/** The reference pipeline's operator surface as verifiable queries over
  * the synthetic `documents` table (plus the four reference binary
  * fixtures for the extraction stages, whose oracles are frozen golden
  * row sets — see FixtureGolden).
  * SURVEY.md §2.2-§2.5 mapping noted per query.
  */
object PipelineQueries {

  private val FixtureDir = "/root/reference/nifi-extracttext-processors/src/test/resources"

  /** The planted page + real-parse link rows shared by q_html_links
    * and q_anchor_text: every document renders to HTML whose three
    * anchors exercise double-quoted, single-quoted-with-entity, and
    * bare-attribute parses; <title>/<script> content must NOT leak.
    * Returns (doc_id, idx, href, anchor) via the REAL extractor UDF —
    * the oracles predict these rows analytically from id arithmetic,
    * so only a correct attribute parse + entity decode can match. */
  private def plantedLinkRows(docs: DataFrame): DataFrame = {
    val id = col("doc_id").cast("string")
    val html = concat(
      lit("<html><head><title>Doc "), id,
      lit("</title><script>var x=1;</script></head><body><p>intro</p>"),
      lit("<a href=\"https://ref-"), (col("doc_id") % 7).cast("string"),
      lit(".example.com/page/"), id, lit("\">ref "), id, lit("</a>"),
      when(col("doc_id") % 2 === 0,
        concat(lit("<a href='/rel/"), id, lit("'>internal &amp; local</a>")))
        .otherwise(lit("")),
      when(col("doc_id") % 3 === 0,
        concat(lit("<a class=\"x\" href=/bare/"), id, lit(">bare "),
          (col("doc_id") % 5).cast("string"), lit("</a>")))
        .otherwise(lit("")),
      lit("</body></html>"))
    val linksUdf = udf((h: String) => graft.extract.HtmlText.extractLinks(h))
    docs.select(col("doc_id"), linksUdf(html).as("ls"))
      .select(col("doc_id"), posexplode(col("ls")))
      .select(col("doc_id"), col("pos").as("idx"),
        col("col._1").as("href"), col("col._2").as("anchor"))
  }

  private def docsWithSentiment(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).withColumn("sentiment", Sentiment.sentimentCol(col("text")))

  private def routeQuery(route: String): (SparkSession, String) => DataFrame =
    (s, d) => {
      val records = docsWithSentiment(s, d)
        .select(col("doc_id"), col("lang"), col("source"), col("sentiment"))
      // the template's QueryRecord SQL verbatim (56409-tika.xml:1847-1859)
      Router.routes(records, Router.SentimentRoutes, includeZeroRecordRoutes = true)(route)
        .orderBy(col("doc_id"))
    }

  private def routeOracle(label: String): String =
    s"""SELECT doc_id, lang, source, sentiment FROM (
       |  SELECT doc_id, lang, source, ${Sentiment.duckdbExpr("text")} AS sentiment
       |  FROM documents)
       |WHERE sentiment = '$label' ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1 QueryRecord: the template's three sentiment routes
    "q_route_good"    -> routeQuery("good"),
    "q_route_bad"     -> routeQuery("bad"),
    "q_route_neutral" -> routeQuery("neutral"),

    // G1 SplitText as a generator op: one row per token with position
    "q_split_tokens" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos0", "tok")))
        .select(col("doc_id"), (col("pos0") + 1).cast("int").as("pos"), col("tok"))
        .orderBy(col("doc_id"), col("pos"))
    }),

    // G2 ExtractText: regex capture group → sentence attribute
    "q_sentence_extract" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          regexp_extract(col("text"), "(^.*$)", 1).as("sentence"))
        .orderBy(col("doc_id"))
    }),

    // T8 AttributesToJSON: attribute set → JSON content column
    "q_attrs_to_json" -> ((s, d) => {
      docsWithSentiment(s, d)
        .select(col("doc_id"),
          to_json(struct(col("doc_id"), col("lang"), col("source"),
            col("n_chars"), col("sentiment"))).as("json"))
        .orderBy(col("doc_id"))
    }),

    // Flagship: the full tag pipeline aggregated per route
    "q_doc_pipeline" -> ((s, d) => {
      docsWithSentiment(s, d)
        .withColumn("n_tokens", size(split(col("text"), " ")))
        .groupBy(col("sentiment"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).cast("long").as("n_tokens"))
        .orderBy(col("sentiment"), col("lang"))
    }),

    // T1-T4 ExtractTextProcessor over the reference's own fixtures
    // (binary → text; oracle = FixtureGolden golden row set + ScalaTest
    // parity — change extraction behavior and the golden must move too)
    "q_extract_fixtures" -> ((s, _) => {
      val enriched = DocPipeline.enrich(DocPipeline.ingest(s, FixtureDir))
      enriched.select(col("filename"), col("mime_type"), col("orig_mime_type"),
          length(col("text")).as("text_chars"), col("error"))
        .orderBy(col("filename"))
    }),

    // extraction at CORPUS width: 500 synthetic real containers (100
    // per format — PDF/DOCX/ODT/HTML/TXT, hand-built from the public
    // specs by SynthDocs) through the same list+fetch+detect+extract
    // pipeline, each document's text compared against its planted
    // expectation. The analytic oracle pins 100 exact extractions per
    // format — a dropped file, a misrouted MIME type, or one wrong
    // byte of extracted text breaks the count. (The throughput ladder
    // runs the same corpus at 2k/20k docs — graft.ExtractScale.)
    "q_extract_synth" -> ((s, _) => {
      import s.implicits._
      val n = 500L
      val dir = java.nio.file.Paths.get(
        // per-SESSION dir (applicationId): concurrent Verify/Bench
        // drivers can never share a corpus dir even in principle
        // (VERDICT r18 note); within one session the write stays
        // idempotent across bench iterations
        sys.props("java.io.tmpdir"),
        s"graft_synthdocs_${n}_${s.sparkContext.applicationId}")
      graft.extract.SynthDocs.writeCorpus(dir, n)
      val expected = s.range(0, n).map { i =>
        (graft.extract.SynthDocs.fileName(i),
          graft.extract.SynthDocs.expectedText(i),
          graft.extract.SynthDocs.formatFor(i))
      }.toDF("filename", "expected", "fmt")
      val enriched = DocPipeline.enrich(DocPipeline.ingest(s, dir.toString))
      enriched.join(expected, Seq("filename"))
        .groupBy(col("fmt"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("error").isNull && col("text") === col("expected"), 1L)
            .otherwise(0L)).as("n_exact"))
        .orderBy(col("fmt"))
    }),

    // extraction at corpus width over the HEAVY formats (VERDICT r17
    // #3's generator, oracle-gated like the easy corpus): 300 real
    // containers — 100 FlateDecode multi-stream PDFs (planted words
    // never in the raw bytes), 100 fast-saved OLE2 .doc piece tables,
    // 100 AES-V2 encrypted PDFs — through the same pipeline, every
    // document's ~7.3 KB text compared against its planted expectation
    // in-plan. A wrong inflate, a mis-walked FAT sector, or one bad
    // AES block breaks an exactness count.
    "q_extract_heavy" -> ((s, _) => {
      import s.implicits._
      val n = 300L
      val dir = java.nio.file.Paths.get(
        // per-SESSION dir — same discipline as graft_synthdocs above
        sys.props("java.io.tmpdir"),
        s"graft_synthheavy_${n}_${s.sparkContext.applicationId}")
      graft.extract.SynthHeavyDocs.writeCorpus(dir, n)
      val expected = s.range(0, n).map { i =>
        (graft.extract.SynthHeavyDocs.fileName(i),
          graft.extract.SynthHeavyDocs.expectedText(i),
          graft.extract.SynthHeavyDocs.formatFor(i))
      }.toDF("filename", "expected", "fmt")
      val enriched = DocPipeline.enrich(DocPipeline.ingest(s, dir.toString))
      enriched.join(expected, Seq("filename"))
        .groupBy(col("fmt"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("error").isNull && col("text") === col("expected"), 1L)
            .otherwise(0L)).as("n_exact"))
        .orderBy(col("fmt"))
    }),

    // T3 HTML output mode over the fixtures (FixtureGolden oracle)
    "q_extract_fixtures_html" -> ((s, _) => {
      val enriched = DocPipeline.enrich(DocPipeline.ingest(s, FixtureDir),
        DocPipeline.ExtractConfig(htmlOutput = true))
      enriched.select(col("filename"), col("mime_type"),
          length(col("text")).as("html_chars"))
        .orderBy(col("filename"))
    }),

    // T5 ExtractMediaMetadata over the fixtures (FixtureGolden oracle)
    "q_extract_metadata" -> ((s, _) => {
      val enriched = DocPipeline.enrich(DocPipeline.ingest(s, FixtureDir))
      enriched.select(col("filename"), explode(col("meta")).as(Seq("key", "value")))
        .orderBy(col("filename"), col("key"))
    }),

    // N1 entity extraction over extracted fixture lines (FixtureGolden oracle)
    "q_entities_fixtures" -> ((s, _) => {
      val enriched = DocPipeline.enrich(DocPipeline.ingest(s, FixtureDir))
      val lines = DocPipeline.toLines(enriched.filter(col("error").isNull))
      lines.select(col("filename"), explode(Udfs.extractEntities(col("sentence"))).as("entity"))
        .groupBy(col("entity")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= 3)
        .orderBy(desc("n"), col("entity"))
    }),

    // T2 legacy binary formats: BIFF8 .xls and .ppt through the same
    // pipeline (the reference extracts ANY Tika-detected type,
    // ETP.java:174-175 — these are the still-common legacy containers
    // its auto-detect would route). Fixtures are synthetic CFB files
    // built from the public [MS-XLS]/[MS-PPT] record structure
    // (deterministic bytes), so the full extracted TEXT is
    // golden-pinned — the strongest oracle the format allows.
    "q_extract_legacy" -> ((s, _) => {
      val dir = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft_legacy_fixtures")
      graft.extract.LegacyOffice.writeFixtures(dir)
      val enriched = DocPipeline.enrich(DocPipeline.ingest(s, dir.toString))
      enriched.select(col("filename"), col("mime_type"),
          col("orig_mime_type"), col("text"))
        .orderBy(col("filename"))
    }),

    // T5 ExtractMediaMetadata pointed at actual MEDIA (its namesake
    // usage, tika.xml:1726-1761): JPEG EXIF/SOF, PNG IHDR/tEXt, GIF
    // header over synthetic fixtures (MediaFixtures — deterministic
    // bytes). The allowlist keyFilter drops Content-Length (an encoder
    // implementation detail, not a planted fact) via the processor's
    // own filter property rather than post-hoc projection.
    "q_extract_media_metadata" -> ((s, _) => {
      val dir = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft_media_fixtures")
      graft.extract.MediaFixtures.writeFixtures(dir)
      val docs = DocPipeline.ingest(s, dir.toString)
        .withColumn("filename", element_at(split(col("path"), "/"), -1))
      docs.select(col("filename"),
          explode(Udfs.extract_metadata(col("content"), col("filename"),
            lit("^(Content-Type|Image-.*|Bit-Depth|Color-Type|Orientation|" +
              "Make|Model|DateTime|DateTimeOriginal|tEXt:.*|" +
              "Duration-Ms|Track-Count|Codecs|" +
              "Channels|Sample-Rate|Bits-Per-Sample|" +
              "Title|Artist|Album|Year|MPEG-Version|Layer|Bitrate)$"),
            lit(""))).as(Seq("key", "value")))
        .orderBy(col("filename"), col("key"))
    }),

    // T7 AttributeCleaner: sanitize illegal column names
    "q_clean_attr_names" -> ((s, d) => {
      val dirty = Tables.documents(s, d)
        .select(col("doc_id").as("doc id"), col("lang").as("lang-code"),
          col("n_chars").as("n.chars"))
      Udfs.cleanColumnNames(dirty).orderBy(col("doc_id"))
    }),

    // T5 with Metadata Key Filter + Metadata Key Prefix
    // (tika.xml:1740-1750): only full-regex-matching keys survive, each
    // prefixed. Output is fully deterministic (fixture sizes + MIME
    // detection), so the oracle is the golden row set itself — the
    // reference's own assert-on-observable-output test style.
    "q_extract_metadata_filtered" -> ((s, _) => {
      val docs = DocPipeline.ingest(s, FixtureDir)
        .withColumn("filename", element_at(split(col("path"), "/"), -1))
      docs.select(col("filename"),
          explode(Udfs.extract_metadata(col("content"), col("filename"),
            lit("^Content-.*"), lit("media."))).as(Seq("key", "value")))
        .orderBy(col("filename"), col("key"))
    }),

    // Q3/K1 under the HASH gate: the sentiment route fan-out written
    // ONCE through the single-pass partitionBy sink (the scan-once
    // alternative to N filtered writes), then read back with the route
    // recovered from the directory layout — every doc must land in
    // exactly its sentiment's partition and survive the cycle.
    "q_route_sink_roundtrip" -> ((s, d) => {
      val dir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        s"graft_routes_${Integer.toHexString(d.hashCode)}")
      def deleteRec(f: java.io.File): Unit = {
        Option(f.listFiles).getOrElse(Array.empty[java.io.File]).foreach(deleteRec)
        f.delete(); ()
      }
      deleteRec(dir.toFile)
      val records = docsWithSentiment(s, d)
        .select(col("doc_id"), col("lang"), col("sentiment"))
      graft.pipeline.Sinks.putFilePartitioned(records, dir.toString, "sentiment")
      s.read.parquet(dir.toString)
        .select(col("doc_id"), col("lang"),
          col("sentiment").cast("string").as("sentiment"))
        .orderBy(col("doc_id"))
    }),

    // A1 MergeContent + the Avro container codec under the HASH gate
    // (previously spec-only): documents are binned into real Avro
    // object-container files by the distributed writer (size-bounded
    // bins, tmp-file + rename commit), then read back through a
    // binaryFile scan + per-container decode — one write job, one
    // map-only read, and every record must survive the
    // Spark→Avro→Spark round trip byte-exactly (md5-pinned). This is
    // the reference's merge→Kafka payload path with the broker
    // replaced by the filesystem (the only offline-honest sink).
    "q_avro_roundtrip" -> ((s, d) => {
      import s.implicits._
      val dir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        s"graft_avro_rt_${Integer.toHexString(d.hashCode)}").toString
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"),
          col("source"))
      graft.pipeline.AvroIo.writeAvroBins(docs.repartition(4), dir,
        recordName = "PDF", maxRecordsPerFile = 100)
      s.read.format("binaryFile").load(s"$dir/*.avro")
        .select(col("content")).as[Array[Byte]]
        .flatMap { bytes =>
          val (_, recs) = graft.pipeline.AvroIo.readContainer(bytes)
          recs.map(r => (r.get("doc_id").asInstanceOf[Long],
            r.get("text").toString, r.get("source").toString))
        }
        .toDF("doc_id", "text", "source")
        .select(col("doc_id"), md5(col("text")).as("text_md5"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // Anchor/link extraction from HTML — the link-graph feed of a
    // web-corpus pipeline. Every document renders to a planted page
    // whose three anchors exercise the real parse: double-quoted,
    // single-quoted-with-entity, and bare (unquoted, href not the
    // first attribute); <title>/<script> content must NOT leak into
    // anchors. The oracle predicts (idx, href, decoded text)
    // analytically from id arithmetic, so only a real attribute parse
    // + entity decode can match. Map-only.
    "q_html_links" -> ((s, d) =>
      plantedLinkRows(Tables.documents(s, d))
        .select(col("doc_id"), col("idx"), col("href"), col("anchor"))
        .orderBy(col("doc_id"), col("idx"))),

    // Anchor-text corpus construction over the same planted link
    // graph: anchors describe the TARGET page (the classic web-corpus
    // training/retrieval signal), so per registrable target host we
    // keep the top-3 anchor strings by frequency plus the host's
    // inlink total. Only absolute links aggregate here — a relative
    // href needs the page's own base URL joined in first (documented,
    // not silently hosted as ""). Scale shape: the ranking window runs
    // over the (host, anchor, cnt) AGGREGATE — bounded by distinct
    // anchor-text cardinality, never the link stream — and the totals
    // join is host-cardinality.
    "q_anchor_text" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val abs = plantedLinkRows(Tables.documents(s, d))
        .withColumn("host", regexp_extract(col("href"), "^https?://([^/]+)", 1))
        .filter(col("host") =!= "")
      val perAnchor = abs.groupBy(col("host"), col("anchor"))
        .agg(count(lit(1)).as("cnt"))
      val totals = abs.groupBy(col("host")).agg(count(lit(1)).as("n_links"))
      val w = Window.partitionBy(col("host"))
        .orderBy(col("cnt").desc, col("anchor"))
      perAnchor.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .join(totals, Seq("host"))
        .orderBy(col("host"), col("rank"))
    }),

    // Schema evolution across shard generations — the operational
    // reality of a long-lived 100 TB corpus: v1 shards lack a column
    // later generations carry. mergeSchema unifies the read; v1 rows
    // surface NULL for the new column and every row keeps its
    // generation tag. The oracle derives the same union analytically
    // (even docs are v1, odd v2 with quality = n_chars % 100), so a
    // reader that dropped v1 rows, failed on the missing column, or
    // misaligned columns cannot match.
    "q_schema_merge" -> ((s, d) => {
      val dir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        s"graft_schmerge_${Integer.toHexString(d.hashCode)}").toString
      val docs = Tables.documents(s, d)
      docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("source"))
        .write.mode("overwrite").parquet(s"$dir/gen=1")
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("source"),
          (col("n_chars") % 100).as("quality"))
        .write.mode("overwrite").parquet(s"$dir/gen=2")
      s.read.option("mergeSchema", "true").parquet(dir)
        .select(col("doc_id"), col("source"), col("quality"), col("gen"))
        .orderBy(col("doc_id"))
    }),

    // Columnar-format breadth: the documents table round-trips through
    // ORC (Spark's second native columnar format) and the read-back is
    // pinned against DuckDB reading the PARQUET originals — per-source
    // row counts plus an ORDER-FREE corpus digest: bit_xor over a
    // 60-bit prefix of md5(id:md5(text)) per row (the q_corpus_checksum
    // xor_sig pattern — commutative, partial-aggregable, no per-source
    // collect_list buffer, so the digest stays O(1) per aggregation
    // state at any corpus size). A lossy writer, reader, or schema
    // coercion breaks the signature. Scale shape: one distributed
    // write, one distributed scan, constant-size aggregate state.
    "q_orc_roundtrip" -> ((s, d) => {
      val dir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        s"graft_orc_rt_${Integer.toHexString(d.hashCode)}").toString
      Tables.documents(s, d).write.mode("overwrite").format("orc").save(dir)
      val rec = concat_ws(":", col("doc_id").cast("string"),
        md5(coalesce(col("text"), lit(""))))
      s.read.format("orc").load(dir)
        .select(col("source"),
          conv(substring(md5(rec), 1, 15), 16, 10).cast("long").as("h"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), expr("bit_xor(h)").as("xor_sig"))
        .orderBy(col("source"))
    }),

    // A1 in Correlation-Attribute mode (tika.xml's bin-by-attribute
    // grouping): containers are written per source and every container
    // must hold EXACTLY ONE source's records — bin_pure is computed
    // from the decoded container itself, so a mixed bin cannot match
    // the all-true oracle.
    "q_merge_correlation" -> ((s, d) => {
      import s.implicits._
      val dir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        s"graft_avro_corr_${Integer.toHexString(d.hashCode)}").toString
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"),
          col("source"))
      graft.pipeline.AvroIo.writeAvroBinsBy(docs, dir, "source",
        maxRecordsPerFile = 64)
      s.read.format("binaryFile").load(s"$dir/*.avro")
        .select(col("content")).as[Array[Byte]]
        .flatMap { bytes =>
          val (_, recs) = graft.pipeline.AvroIo.readContainer(bytes)
          val srcs = recs.map(_.get("source").toString).distinct
          recs.map(r => (r.get("doc_id").asInstanceOf[Long],
            r.get("source").toString, srcs.length == 1))
        }
        .toDF("doc_id", "source", "bin_pure")
        .orderBy(col("doc_id"))
    }),

    // K2's PAYLOAD under the hash gate: the exact Avro container bytes
    // a broker would receive (LogKafkaSink produces the same payloads
    // as the real sink — only the network hop is stubbed) decoded back
    // to records. The unavoidable offline gap shrinks to the send
    // itself; the serialized message content is now oracle-verified.
    "q_kafka_payload" -> ((s, d) => {
      import s.implicits._
      val records = docsWithSentiment(s, d)
        .select(col("doc_id"), col("lang"), col("sentiment"))
      new graft.pipeline.Sinks.LogKafkaSink().payloads(records)
        .select(col("value")).as[Array[Byte]]
        .flatMap { bytes =>
          val (_, recs) = graft.pipeline.AvroIo.readContainer(bytes)
          recs.map(r => (r.get("doc_id").asInstanceOf[Long],
            r.get("lang").toString, r.get("sentiment").toString))
        }
        .toDF("doc_id", "lang", "sentiment")
        .orderBy(col("doc_id"))
    }),

    // A2 InferAvroSchema: the inferred AVRO schema document of the JSON
    // records — record name PDF, pretty JSON, matching the template's
    // inferred.avro.schema attribute (deterministic string; FixtureGolden-style VALUES oracle)
    "q_infer_schema" -> ((s, d) => {
      import s.implicits._
      val json = docsWithSentiment(s, d)
        .select(to_json(struct(col("doc_id"), col("lang"), col("sentiment"))).as("json"))
      val avro = DocPipeline.inferSchema(json, "json")
      Seq(avro).toDF("avro_schema")
    })
  )

  def oracleSql: Map[String, String] = Map(
    // 100 exact extractions per format, by construction of the
    // deterministic corpus (SynthDocsSpec pins text equality per
    // format; the query re-checks every document in-plan)
    "q_extract_synth" ->
      """SELECT * FROM (VALUES
        |  ('docx', CAST(100 AS BIGINT), CAST(100 AS BIGINT)),
        |  ('html', CAST(100 AS BIGINT), CAST(100 AS BIGINT)),
        |  ('odt',  CAST(100 AS BIGINT), CAST(100 AS BIGINT)),
        |  ('pdf',  CAST(100 AS BIGINT), CAST(100 AS BIGINT)),
        |  ('txt',  CAST(100 AS BIGINT), CAST(100 AS BIGINT))
        |) AS t(fmt, n_docs, n_exact) ORDER BY fmt""".stripMargin,
    // 100 exact extractions per HEAVY format, by construction
    // (SynthHeavyDocsSpec pins per-format text equality; the query
    // re-checks all 300 documents in-plan)
    "q_extract_heavy" ->
      """SELECT * FROM (VALUES
        |  ('doc',    CAST(100 AS BIGINT), CAST(100 AS BIGINT)),
        |  ('pdfenc', CAST(100 AS BIGINT), CAST(100 AS BIGINT)),
        |  ('pdfz',   CAST(100 AS BIGINT), CAST(100 AS BIGINT))
        |) AS t(fmt, n_docs, n_exact) ORDER BY fmt""".stripMargin,
    "q_route_good"    -> routeOracle("POSITIVE"),
    "q_route_bad"     -> routeOracle("NEGATIVE"),
    "q_route_neutral" -> routeOracle("NEUTRAL"),
    "q_split_tokens" ->
      """SELECT doc_id, cast(generate_subscripts(parts, 1) AS INT) AS pos, unnest(parts) AS tok
        |FROM (SELECT doc_id, string_split(text, ' ') AS parts FROM documents)
        |ORDER BY doc_id, pos""".stripMargin,
    "q_sentence_extract" ->
      """SELECT doc_id, regexp_extract(text, '(^.*$)', 1) AS sentence
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_attrs_to_json" ->
      s"""SELECT doc_id, to_json(struct_pack(doc_id := doc_id, lang := lang,
         |  source := source, n_chars := n_chars, sentiment := sentiment)) AS json
         |FROM (SELECT *, ${Sentiment.duckdbExpr("text")} AS sentiment FROM documents)
         |ORDER BY doc_id""".stripMargin,
    "q_doc_pipeline" ->
      s"""SELECT sentiment, lang, count(*) AS n_docs,
         |  cast(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
         |FROM (SELECT *, ${Sentiment.duckdbExpr("text")} AS sentiment FROM documents)
         |GROUP BY sentiment, lang ORDER BY sentiment, lang""".stripMargin,
    "q_clean_attr_names" ->
      """SELECT doc_id, lang AS lang_code, n_chars AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Fixture-driven extraction stages: inputs are the reference's own
    // immutable test fixtures, so the observable output is a constant —
    // the oracle is the golden row set itself (see FixtureGolden).
    // the routed partition value must equal the sentiment recomputed
    // analytically — a doc in the wrong route dir cannot match
    "q_route_sink_roundtrip" ->
      s"""SELECT doc_id, lang, ${Sentiment.duckdbExpr("text")} AS sentiment
         |FROM documents ORDER BY doc_id""".stripMargin,
    // every container single-source → all-true purity column
    "q_merge_correlation" ->
      """SELECT doc_id, source, true AS bin_pure
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the broker-bound bytes must decode to exactly these records
    "q_kafka_payload" ->
      s"""SELECT doc_id, lang, ${Sentiment.duckdbExpr("text")} AS sentiment
         |FROM documents ORDER BY doc_id""".stripMargin,
    // only a byte-exact Spark→Avro→Spark record round trip matches
    "q_avro_roundtrip" ->
      """SELECT doc_id, md5(coalesce(text, '')) AS text_md5, source
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_html_links" ->
      """WITH a1 AS (
        |  SELECT doc_id, 0 AS idx,
        |    'https://ref-' || CAST(doc_id % 7 AS VARCHAR) || '.example.com/page/'
        |      || CAST(doc_id AS VARCHAR) AS href,
        |    'ref ' || CAST(doc_id AS VARCHAR) AS anchor
        |  FROM documents),
        |a2 AS (
        |  SELECT doc_id, 1 AS idx, '/rel/' || CAST(doc_id AS VARCHAR) AS href,
        |    'internal & local' AS anchor
        |  FROM documents WHERE doc_id % 2 = 0),
        |a3 AS (
        |  SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS idx,
        |    '/bare/' || CAST(doc_id AS VARCHAR) AS href,
        |    'bare ' || CAST(doc_id % 5 AS VARCHAR) AS anchor
        |  FROM documents WHERE doc_id % 3 = 0)
        |SELECT doc_id, idx, href, anchor FROM (
        |  SELECT * FROM a1 UNION ALL SELECT * FROM a2 UNION ALL SELECT * FROM a3)
        |ORDER BY doc_id, idx""".stripMargin,
    // only the a1 anchors are absolute (the relative /rel and /bare
    // hrefs are excluded until resolved against a base URL — mirroring
    // the engine's documented absolute-only aggregation)
    "q_anchor_text" ->
      """WITH l AS (
        |  SELECT 'ref-' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' AS host,
        |    'ref ' || CAST(doc_id AS VARCHAR) AS anchor
        |  FROM documents),
        |pa AS (SELECT host, anchor, count(*) AS cnt FROM l GROUP BY 1, 2),
        |t AS (SELECT host, count(*) AS n_links FROM l GROUP BY 1),
        |r AS (SELECT host, anchor, cnt,
        |        row_number() OVER (PARTITION BY host
        |                           ORDER BY cnt DESC, anchor) AS rank
        |      FROM pa)
        |SELECT host, anchor, cnt, rank, n_links
        |FROM r JOIN t USING (host) WHERE rank <= 3
        |ORDER BY host, rank""".stripMargin,
    "q_schema_merge" ->
      """SELECT doc_id, source, CAST(NULL AS BIGINT) AS quality,
        |  CAST(1 AS INT) AS gen
        |FROM documents WHERE doc_id % 2 = 0
        |UNION ALL
        |SELECT doc_id, source, n_chars % 100 AS quality, CAST(2 AS INT) AS gen
        |FROM documents WHERE doc_id % 2 = 1
        |ORDER BY doc_id""".stripMargin,
    "q_orc_roundtrip" ->
      """WITH r AS (
        |  SELECT source,
        |    CAST('0x' || substr(md5(
        |      CAST(doc_id AS VARCHAR) || ':' || md5(coalesce(text, ''))
        |    ), 1, 15) AS BIGINT) AS h
        |  FROM documents)
        |SELECT source, count(*) AS n_docs, bit_xor(h) AS xor_sig
        |FROM r GROUP BY source ORDER BY source""".stripMargin,
    "q_extract_fixtures"      -> FixtureGolden.extractFixtures,
    "q_extract_legacy"        -> FixtureGolden.extractLegacy,
    "q_extract_media_metadata" -> FixtureGolden.extractMediaMetadata,
    "q_extract_fixtures_html" -> FixtureGolden.extractFixturesHtml,
    "q_extract_metadata"      -> FixtureGolden.extractMetadata,
    "q_entities_fixtures"     -> FixtureGolden.entitiesFixtures,
    "q_infer_schema"          -> FixtureGolden.inferSchema,
    "q_extract_metadata_filtered" ->
      """SELECT * FROM (VALUES
        |  ('big.pdf',     'media.Content-Length', '905553'),
        |  ('big.pdf',     'media.Content-Type',   'application/pdf'),
        |  ('simple.doc',  'media.Content-Length', '24064'),
        |  ('simple.doc',  'media.Content-Type',   'application/msword'),
        |  ('simple.docx', 'media.Content-Length', '14871'),
        |  ('simple.docx', 'media.Content-Type',
        |   'application/vnd.openxmlformats-officedocument.wordprocessingml.document'),
        |  ('simple.pdf',  'media.Content-Length', '3028'),
        |  ('simple.pdf',  'media.Content-Type',   'application/pdf')
        |) AS t(filename, "key", "value") ORDER BY filename, "key"""".stripMargin
  )
}
