package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import graft.extract.{Metadata, MimeDetect, TextExtractor}

/** The engine's scalar-function surface (SURVEY.md §2.8): Spark UDFs
  * wrapping the pure-Scala extractors. Each mirrors one reference
  * operator; routing mirrors `wasError` (ExtractTextProcessor.java:146,
  * 201) by carrying an `error` field instead of throwing.
  *
  * These are deliberately plain `functions.udf` (not Pandas/Python): the
  * closures are JVM-local, serialize once per executor, and process one
  * row per call with zero copies beyond the row itself. The hot
  * pure-column paths (sentiment, token stats) additionally exist as
  * Catalyst column expressions that stay inside whole-stage codegen
  * (see [[Sentiment.sentimentCol]], [[graft.functions.TextStats]]).
  */
object Udfs {

  /** T1 MIME detect (ExtractTextProcessor.java:153,156). */
  val detectMime = udf((content: Array[Byte], filename: String) =>
    MimeDetect.detect(content, filename))

  /** T2/T3/T4 text or HTML extraction + mime attrs + error in one pass
    * (struct result so one parse serves all downstream columns). */
  val extractDoc = udf((content: Array[Byte], filename: String, maxLen: Int, html: Boolean) => {
    val r = TextExtractor.extract(content, filename, maxLen, html)
    (r.text, r.mimeType, r.origMimeType, r.error)
  })

  /** T5 ExtractMediaMetadata (56409-tika.xml:1726-1761). */
  val extractMetadata = udf((content: Array[Byte], filename: String) =>
    Metadata.extract(content, filename))

  /** T5 with the processor's `Metadata Key Filter` (regex a key must
    * fully match; empty = keep all) and `Metadata Key Prefix`
    * properties (56409-tika.xml:1740-1750). */
  val extractMetadataOpts = udf(
    (content: Array[Byte], filename: String, keyFilter: String, keyPrefix: String) =>
      Metadata.extract(content, filename, Metadata.Options(
        keyFilter = Option(keyFilter).filter(_.nonEmpty),
        keyPrefix = Option(keyPrefix).getOrElse(""))))

  /** N2 sentiment (UDF form; prefer Sentiment.sentimentCol in plans). */
  val sentiment = udf((sentence: String) => Sentiment.label(sentence))

  /** N1 entity extraction. */
  val extractEntities = udf((sentence: String) => Entities.extract(sentence))

  /** T7 AttributeCleanerProcessor: legal Avro/SQL field names
    * (56409-tika.xml:1439-1450). */
  def cleanAttrName(name: String): String = {
    val cleaned = name.replaceAll("[^A-Za-z0-9_]", "_")
    if (cleaned.isEmpty || !Character.isJavaIdentifierStart(cleaned.charAt(0))) "_" + cleaned
    else cleaned
  }

  /** Rename all columns of a DataFrame to cleaned names (T7 as an op). */
  def cleanColumnNames(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.toDF(df.columns.map(cleanAttrName).toIndexedSeq: _*)

  def detect_mime(content: Column, filename: Column): Column = detectMime(content, filename)
  def extract_doc(content: Column, filename: Column, maxLen: Column, html: Column): Column =
    extractDoc(content, filename, maxLen, html)
  def extract_metadata(content: Column, filename: Column): Column =
    extractMetadata(content, filename)
  def extract_metadata(content: Column, filename: Column,
                       keyFilter: Column, keyPrefix: Column): Column =
    extractMetadataOpts(content, filename, keyFilter, keyPrefix)
}
