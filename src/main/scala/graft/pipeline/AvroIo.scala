package graft.pipeline

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Avro wire format for the pipeline sinks — the reference template's
  * record format end to end: InferAvroSchema emits an Avro schema
  * document (56409-tika.xml:1611-1646: record name `PDF`, pretty JSON),
  * MergeContent merges with `Merge Format=Avro` into container files
  * (tika.xml:1325-1362), PutFile lands the bins (tika.xml:1096-1100),
  * and PublishKafkaRecord's AvroRecordSetWriter embeds the schema in
  * each payload (tika.xml:2501-2548).
  *
  * Built on the avro core jar alone (no spark-avro connector in this
  * environment): Spark rows convert to `GenericRecord` per partition —
  * narrow, shuffle-free, one container file per task, so the write
  * parallelizes like any other sink at cluster scale.
  */
object AvroIo {

  /** Spark schema → Avro schema. Nullable fields become the standard
    * `["null", T]` union with a null default, mirroring what NiFi's
    * (Kite-based) InferAvroSchema emits for JSON-sampled records. */
  def avroSchemaFor(schema: StructType, recordName: String,
                    namespace: String = "graft"): Schema = {
    def convert(dt: DataType, path: String): Schema = dt match {
      case StringType                      => Schema.create(Schema.Type.STRING)
      case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
      case LongType                        => Schema.create(Schema.Type.LONG)
      case FloatType                       => Schema.create(Schema.Type.FLOAT)
      case DoubleType                      => Schema.create(Schema.Type.DOUBLE)
      case BooleanType                     => Schema.create(Schema.Type.BOOLEAN)
      case BinaryType                      => Schema.create(Schema.Type.BYTES)
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case DateType =>
        LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
      case d: DecimalType =>
        LogicalTypes.decimal(d.precision, d.scale)
          .addToSchema(Schema.create(Schema.Type.BYTES))
      case ArrayType(elem, containsNull) =>
        Schema.createArray(nullable(convert(elem, path + "_item"), containsNull))
      case MapType(StringType, v, valueContainsNull) =>
        Schema.createMap(nullable(convert(v, path + "_value"), valueContainsNull))
      case st: StructType => record(st, path)
      case other =>
        throw new IllegalArgumentException(s"no avro mapping for $other at $path")
    }
    def nullable(s: Schema, isNullable: Boolean): Schema =
      if (isNullable) Schema.createUnion(Schema.create(Schema.Type.NULL), s) else s
    def record(st: StructType, name: String): Schema = {
      val fields = st.fields.map { f =>
        new Schema.Field(f.name, nullable(convert(f.dataType, name + "_" + f.name), f.nullable),
          null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
      }
      Schema.createRecord(name, null, namespace, false, fields.toSeq.asJava)
    }
    record(schema, recordName)
  }

  /** One Spark row → one Avro generic record (recursive; inverse of the
    * [[avroSchemaFor]] mapping). */
  private def toRecord(row: Row, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    var i = 0
    while (i < st.fields.length) {
      val f = st.fields(i)
      val fieldSchema = unwrap(schema.getFields.get(i).schema())
      rec.put(i, if (row.isNullAt(i)) null else toAvro(row.get(i), f.dataType, fieldSchema))
      i += 1
    }
    rec
  }

  private def unwrap(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private def toAvro(v: Any, dt: DataType, schema: Schema): Any = dt match {
    case BinaryType => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
    case TimestampType =>
      // java.sql.Timestamp by default; java.time.Instant when
      // spark.sql.datetime.java8API.enabled=true
      val t = v match {
        case ts: java.sql.Timestamp => ts.toInstant
        case i: java.time.Instant   => i
      }
      t.getEpochSecond * 1000000L + t.getNano / 1000L
    case DateType => v match {
      case d: java.sql.Date      => d.toLocalDate.toEpochDay.toInt
      case ld: java.time.LocalDate => ld.toEpochDay.toInt
    }
    case d: DecimalType =>
      ByteBuffer.wrap(v.asInstanceOf[java.math.BigDecimal]
        .setScale(d.scale).unscaledValue.toByteArray)
    case ArrayType(elem, _) =>
      val es = unwrap(schema.getElementType)
      v.asInstanceOf[scala.collection.Seq[Any]]
        .map(x => if (x == null) null else toAvro(x, elem, es)).asJava
    case MapType(StringType, mv, _) =>
      val vs = unwrap(schema.getValueType)
      v.asInstanceOf[scala.collection.Map[String, Any]].map { case (k, x) =>
        k -> (if (x == null) null else toAvro(x, mv, vs))
      }.toMap.asJava
    case st: StructType => toRecord(v.asInstanceOf[Row], st, schema)
    case _ => v // string / numeric / boolean pass through
  }

  /** A2 InferAvroSchema: sample up to `sample` JSON records (`25
    * records analyzed`, tika.xml:1611-1646), infer the record schema,
    * emit the pretty-printed Avro schema document. */
  def inferAvroSchema(json: DataFrame, jsonCol: String = "json",
                      recordName: String = "PDF", sample: Int = 25): String = {
    val spark = json.sparkSession
    import spark.implicits._
    val ds = json.select(org.apache.spark.sql.functions.col(jsonCol)).limit(sample).as[String]
    avroSchemaFor(spark.read.json(ds).schema, recordName).toString(true)
  }

  /** Serialize a partition's rows as ONE Avro container (embedded
    * schema, registry-less) — the AvroRecordSetWriter payload shape. */
  private def containerBytes(rows: Iterator[Row], st: StructType,
                             schema: Schema): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(CodecFactory.nullCodec())
    w.create(schema, out)
    rows.foreach(r => w.append(toRecord(r, st, schema)))
    w.close()
    out.toByteArray
  }

  /** Decode an Avro container payload back to its records (test /
    * consumer side of the round-trip contract). */
  def readContainer(bytes: Array[Byte]): (Schema, Seq[GenericRecord]) = {
    val (schema, _, records) = readContainerWithMeta(bytes)
    (schema, records)
  }

  /** As [[readContainer]], also surfacing the container's string file
    * metadata (where [[writeAvroBinsBy]] stamps the merged bin's
    * correlation value and common attributes). */
  def readContainerWithMeta(
      bytes: Array[Byte]): (Schema, Map[String, String], Seq[GenericRecord]) = {
    val in = new DataFileStream[GenericRecord](
      new java.io.ByteArrayInputStream(bytes), new GenericDatumReader[GenericRecord]())
    val records = in.iterator().asScala.toVector
    val schema = in.getSchema
    val meta = in.getMetaKeys.asScala
      .filterNot(k => k.startsWith("avro."))
      .map(k => k -> in.getMetaString(k)).toMap
    in.close()
    (schema, meta, records)
  }

  /** MergeContent(Avro) + PutFile: write the DataFrame as Avro container
    * files, one file per task with at most `maxRecordsPerFile` records
    * each (the bin cap, tika.xml `Maximum Number of Entries`). Runs as a
    * narrow `foreachPartition` — no shuffle, no driver materialization;
    * size partitions upstream with [[MergePolicy]].
    *
    * Commit protocol (so task retries / speculative attempts are safe):
    * each task writes `.part-…-<taskAttemptId>.avro.tmp` and renames to
    * its final name only after a clean close, so a retried attempt never
    * collides and a failed attempt leaves only an ignorable `.tmp`. The
    * driver stamps `_SUCCESS` after the job completes — readers and the
    * PutFile "ignore" check key on the marker, not bare existence, so
    * partial output from a failed job is never mistaken for complete.
    * ANY existing target directory is wiped before writing (overwrite
    * semantics): a rerun may produce fewer/different part files (e.g. a
    * different partitioning), and stale parts — whether from a failed
    * run or a previously COMMITTED one — must not sit next to the new
    * run's files under its fresh marker. Callers wanting skip-if-done
    * semantics check the marker first (see `Sinks.putFile`). */
  def writeAvroBins(df: DataFrame, dir: String, recordName: String = "PDF",
                    maxRecordsPerFile: Long = 15000): Unit = {
    val st = df.schema
    val schemaJson = avroSchemaFor(st, recordName).toString
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    locally {
      val dirPath = new org.apache.hadoop.fs.Path(dir)
      val fs = dirPath.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
      if (fs.exists(dirPath)) fs.delete(dirPath, true)
    }
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val dirPath = new org.apache.hadoop.fs.Path(dir)
        val fs = dirPath.getFileSystem(hadoopConf.value)
        fs.mkdirs(dirPath)
        val tc = TaskContext.get()
        val pid = tc.partitionId()
        val attempt = tc.taskAttemptId()
        var fileNo = 0
        while (rows.hasNext) {
          val finalPath =
            new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d-$fileNo%03d.avro")
          val tmpPath = new org.apache.hadoop.fs.Path(
            dir, f".part-$pid%05d-$fileNo%03d-$attempt.avro.tmp")
          val out = fs.create(tmpPath, true)
          val w = new DataFileWriter[GenericRecord](
            new GenericDatumWriter[GenericRecord](schema))
          w.create(schema, out)
          var n = 0L
          while (rows.hasNext && n < maxRecordsPerFile) {
            w.append(toRecord(rows.next(), st, schema))
            n += 1
          }
          w.close() // closes the stream
          // last attempt to finish wins; both attempts hold identical bytes
          fs.delete(finalPath, false)
          if (!fs.rename(tmpPath, finalPath) && !fs.exists(finalPath))
            throw new java.io.IOException(
              s"commit rename failed: $tmpPath -> $finalPath")
          fileNo += 1
        }
      }
    }
    // Driver-side commit marker: written even for an empty DataFrame so
    // "ignore" semantics match parquet mode("ignore") on empty results.
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    fs.mkdirs(dirPath)
    fs.create(new org.apache.hadoop.fs.Path(dirPath, "_SUCCESS"), true).close()
  }

  /** MergeContent with `Correlation Attribute Name` + `Attribute
    * Strategy=Keep Only Common Attributes` (tika.xml:1325-1362): bins
    * group records sharing the correlation attribute's value, and each
    * merged bin keeps only the attributes whose value is identical
    * across every member.
    *
    * Spark mapping: one hash shuffle on the correlation column
    * co-locates each value's records, a sort within partitions makes
    * values contiguous, and each task rolls to a new Avro container
    * whenever the value changes (or the bin cap fills) — one bin per
    * correlation value per cap-window, never a bin spanning values.
    * The merged flowfile's attributes become Avro file METADATA:
    * `merge.correlation` = the bin's value, plus `common.<col>` for
    * every scalar column constant across the bin (the Keep Only Common
    * Attributes / Do Not Merge Uncommon Metadata contract). A bin is
    * buffered in memory to find its common columns — bounded by
    * `maxRecordsPerFile`, the same bound NiFi's in-memory bins have.
    * Same tmp-name + rename + `_SUCCESS` commit protocol as
    * [[writeAvroBins]]. */
  def writeAvroBinsBy(df: DataFrame, dir: String, correlationCol: String,
                      recordName: String = "PDF",
                      maxRecordsPerFile: Long = 15000): Unit = {
    val st = df.schema
    val corrIdx = st.fieldIndex(correlationCol)
    // attribute candidates: scalar columns (attributes are scalar-like;
    // binary/array/map/struct are content, not attributes)
    def isScalar(dt: DataType): Boolean = dt match {
      case _: StructType | _: ArrayType | _: MapType | BinaryType => false
      case _ => true
    }
    val scalarIdx = st.fields.zipWithIndex.collect {
      case (f, i) if isScalar(f.dataType) => i
    }
    val schemaJson = avroSchemaFor(st, recordName).toString
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    locally { // wipe any existing target (overwrite) — see writeAvroBins
      val dirPath = new org.apache.hadoop.fs.Path(dir)
      val fs = dirPath.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
      if (fs.exists(dirPath)) fs.delete(dirPath, true)
    }
    val arranged = df.repartition(org.apache.spark.sql.functions.col(correlationCol))
      .sortWithinPartitions(org.apache.spark.sql.functions.col(correlationCol))
    arranged.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val dirPath = new org.apache.hadoop.fs.Path(dir)
        val fs = dirPath.getFileSystem(hadoopConf.value)
        fs.mkdirs(dirPath)
        val tc = TaskContext.get()
        val pid = tc.partitionId()
        val attempt = tc.taskAttemptId()
        var fileNo = 0

        def flush(bin: Seq[Row]): Unit = {
          if (bin.isEmpty) return
          val finalPath =
            new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d-$fileNo%03d.avro")
          val tmpPath = new org.apache.hadoop.fs.Path(
            dir, f".part-$pid%05d-$fileNo%03d-$attempt.avro.tmp")
          val out = fs.create(tmpPath, true)
          val w = new DataFileWriter[GenericRecord](
            new GenericDatumWriter[GenericRecord](schema))
          val corrValue = bin.head.get(corrIdx)
          w.setMeta("merge.correlation", String.valueOf(corrValue))
          scalarIdx.foreach { i =>
            val v0 = bin.head.get(i)
            if (v0 != null && bin.forall(r => v0 == r.get(i)))
              w.setMeta("common." + st.fields(i).name, String.valueOf(v0))
          }
          w.create(schema, out)
          bin.foreach(r => w.append(toRecord(r, st, schema)))
          w.close()
          fs.delete(finalPath, false)
          if (!fs.rename(tmpPath, finalPath) && !fs.exists(finalPath))
            throw new java.io.IOException(
              s"commit rename failed: $tmpPath -> $finalPath")
          fileNo += 1
        }

        val bin = new scala.collection.mutable.ArrayBuffer[Row]()
        var current: Any = null
        while (rows.hasNext) {
          val r = rows.next()
          val corr = r.get(corrIdx)
          if (bin.nonEmpty && (corr != current || bin.length >= maxRecordsPerFile)) {
            flush(bin.toSeq); bin.clear()
          }
          current = corr
          bin += r
        }
        flush(bin.toSeq)
      }
    }
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    fs.mkdirs(dirPath)
    fs.create(new org.apache.hadoop.fs.Path(dirPath, "_SUCCESS"), true).close()
  }

  /** PublishKafkaRecord payload column: each partition's records become
    * Avro container messages of at most `recordsPerMessage` records with
    * the schema embedded (registry-less — the template's
    * AvroRecordSetWriter contract, tika.xml:2501-2548). Returns a
    * single-column `value: binary` DataFrame ready for the kafka sink.
    * `recordCounter`, when supplied, accumulates the number of RECORDS
    * serialized while the payload column is computed — lets a sink
    * report the record count from the same pass that produces the
    * messages (no second scan). */
  def kafkaPayload(df: DataFrame, recordName: String = "PDF",
                   recordsPerMessage: Int = 100,
                   recordCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame =
    kafkaPayloadCounted(df, recordName, recordsPerMessage, recordCounter)
      .select("value")

  /** [[kafkaPayload]] plus a `records: long` column carrying how many
    * records each container message holds — the per-message count the
    * publish contract sums without decoding the Avro back. */
  def kafkaPayloadCounted(df: DataFrame, recordName: String = "PDF",
                          recordsPerMessage: Int = 100,
                          recordCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    val st = df.schema
    val schemaJson = avroSchemaFor(st, recordName).toString
    val enc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.BINARY,
      org.apache.spark.sql.Encoders.scalaLong)
    df.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      rows.grouped(recordsPerMessage).map { chunk =>
        val n = chunk.size.toLong
        recordCounter.foreach(_.add(n))
        (containerBytes(chunk.iterator, st, schema), n)
      }
    }(enc).toDF("value", "records")
  }
}
