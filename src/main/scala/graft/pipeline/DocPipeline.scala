package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Sentiment, Udfs}

/** The reference's 16-processor flow (SURVEY.md §0, §3.3) as ONE lazily
  * planned DataFrame DAG:
  *
  *   ListFile+FetchFile → ExtractMediaMetadata → ExtractTextProcessor →
  *   SplitText → ExtractText(regex) → NLP/CoreNLP → AttributesToJSON →
  *   QueryRecord routes → sinks
  *
  * Where NiFi hops a queue between 16 independently-scheduled
  * processors, this whole per-record path is shuffle-free narrow
  * transforms — partition-parallel across the cluster, with shuffles
  * only where we choose them (merge policy / partitioned writes).
  */
object DocPipeline {

  /** ListFile's gating config (56409-tika.xml:2302-2344). */
  final case class IngestConfig(
      pathGlobFilter: Option[String] = None, // File Filter=[^\.].* ≈ non-hidden
      minFileSize: Long = 0L,                // Minimum File Size=50 B
      minFileAgeSec: Long = 0L,              // Minimum File Age=30 sec
      recursive: Boolean = true)

  /** ExtractTextProcessor's properties (ExtractTextProcessor.java:75-94). */
  final case class ExtractConfig(maxTextLength: Int = -1, htmlOutput: Boolean = false)

  /** S1+S2 ListFile+FetchFile: the binaryFile source couples list+fetch
    * and yields (path, modificationTime, length, content). */
  def ingest(spark: SparkSession, dir: String, cfg: IngestConfig = IngestConfig()): DataFrame = {
    var reader = spark.read.format("binaryFile")
    cfg.pathGlobFilter.foreach(g => reader = reader.option("pathGlobFilter", g))
    reader = reader.option("recursiveFileLookup", cfg.recursive.toString)
    var df = reader.load(dir)
    if (cfg.minFileSize > 0) df = df.filter(col("length") >= cfg.minFileSize)
    if (cfg.minFileAgeSec > 0)
      df = df.filter(col("modificationTime") <=
        (current_timestamp() - expr(s"INTERVAL ${cfg.minFileAgeSec} SECOND")))
    df
  }

  /** T1–T5: metadata + text extraction; one UDF call per document, all
    * derived columns from the single struct result. */
  def enrich(docs: DataFrame, cfg: ExtractConfig = ExtractConfig()): DataFrame = {
    docs
      .withColumn("filename", element_at(split(col("path"), "/"), -1))
      .withColumn("meta", Udfs.extract_metadata(col("content"), col("filename")))
      .withColumn("x", Udfs.extract_doc(col("content"), col("filename"),
        lit(cfg.maxTextLength), lit(cfg.htmlOutput)))
      .select(
        col("path"), col("filename"), col("length"), col("modificationTime"),
        col("meta"),
        col("x._1").as("text"),
        col("x._2").as("mime_type"),
        col("x._3").as("orig_mime_type"),
        col("x._4").as("error"))
  }

  /** Q2: the wasError route split (ExtractTextProcessor.java:201-202). */
  def successFailure(enriched: DataFrame): (DataFrame, DataFrame) =
    (enriched.filter(col("error").isNull), enriched.filter(col("error").isNotNull))

  /** G1 SplitText (Line Split Count=1, Remove Trailing Newlines=true) +
    * G2 ExtractText regex `(^.*$)` → sentence (56409-tika.xml:2063). */
  def toLines(enriched: DataFrame, textCol: String = "text"): DataFrame =
    enriched
      .select(col("*"), posexplode(split(col(textCol), "\n")).as(Seq("line_no", "line")))
      .filter(length(trim(col("line"))) > 0)
      .withColumn("sentence", regexp_extract(col("line"), "(^.*$)", 1))

  /** N1+N2: entity + sentiment tagging over the sentence attribute. */
  def tag(lines: DataFrame): DataFrame =
    lines
      .withColumn("entities", Udfs.extractEntities(col("sentence")))
      .withColumn("sentiment", Sentiment.sentimentCol(col("sentence")))

  /** T8 AttributesToJSON (Destination=flowfile-content): the record's
    * attribute set serialized as a JSON object column. */
  def toJsonRecords(tagged: DataFrame, cols: Seq[String]): DataFrame =
    tagged.withColumn("json", to_json(struct(cols.map(col): _*)))

  /** A2 InferAvroSchema: infer the record schema from a sample of the
    * JSON column and emit the AVRO SCHEMA DOCUMENT the template stores
    * in `inferred.avro.schema` — record name `PDF`, pretty JSON
    * (56409-tika.xml:1611-1646, `25 records analyzed`). */
  def inferSchema(json: DataFrame, jsonCol: String = "json", sample: Int = 25,
                  recordName: String = "PDF"): String =
    AvroIo.inferAvroSchema(json, jsonCol, recordName, sample)

  /** The Spark-DDL form of the same inference (engine-side convenience,
    * not the template contract). */
  def inferSchemaDdl(json: DataFrame, jsonCol: String = "json", sample: Int = 25): String = {
    val spark = json.sparkSession
    import spark.implicits._
    val ds = json.select(col(jsonCol)).limit(sample).as[String]
    spark.read.json(ds).schema.toDDL
  }
}
