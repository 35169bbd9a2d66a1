package graft.pipeline

import org.apache.spark.sql.DataFrame

/** §2.7 sinks. Only PutFile is materially exercisable offline; Kafka and
  * Slack are behind traits so tests/offline runs use the bundled stubs
  * while a cluster deployment binds the real endpoints.
  */
object Sinks {

  /** K1 PutFile: Conflict Resolution=ignore, Create Missing Directories
    * =true (56409-tika.xml:1096-1100) → mode("ignore") + the writer's
    * directory creation. Partition count is the MergeContent analogue —
    * see [[MergePolicy]]. `format="avro"` writes the template's actual
    * bin format (Merge Format=Avro, tika.xml:1325-1362) via [[AvroIo]];
    * parquet stays the default for analytic outputs. */
  def putFile(df: DataFrame, dir: String, format: String = "parquet",
              partitions: Option[Int] = None): Unit = {
    val out = partitions.map(df.coalesce).getOrElse(df)
    if (format == "avro") {
      // mode("ignore") parity: skip only when a COMMITTED write exists —
      // keyed on the _SUCCESS marker writeAvroBins stamps after the job,
      // so partial output from a failed run is overwritten, and an empty
      // first write (marker, no bins) still suppresses later writes.
      val marker = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
      val fs = marker.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
      if (!fs.exists(marker)) AvroIo.writeAvroBins(out, dir)
    } else out.write.mode("ignore").format(format).save(dir)
  }

  /** Single-pass multi-route write — the scan-once alternative to N
    * filtered writes (SURVEY.md §4.2 multi-route single-scan). */
  def putFilePartitioned(df: DataFrame, dir: String, routeCol: String,
                         format: String = "parquet"): Unit =
    df.write.mode("ignore").format(format).partitionBy(routeCol).save(dir)

  /** K2 PublishKafkaRecord contract (bootstrap, acks, max request size —
    * 56409-tika.xml:2501-2548): JSON records in, AVRO records out — the
    * message value is an Avro container with the schema embedded
    * (AvroRecordSetWriter, registry-less). `KafkaLike` lets offline
    * tests observe the payloads without a broker. */
  trait KafkaLike {
    /** Publishes `df` as Avro container messages; returns the number of
      * RECORDS published (summed across containers) — not the
      * container-message count. The count is APPROXIMATE on the real
      * broker sink: it accumulates during the send pass, so task retries
      * or speculative attempts can over-count. Treat it as a telemetry
      * lower-bound check, not a reconciliation source of truth — exact
      * once-only counts belong to the broker's committed offsets. */
    def publish(df: DataFrame, topic: String): Long
  }

  final class KafkaSink(bootstrapServers: String) extends KafkaLike {
    override def publish(df: DataFrame, topic: String): Long = {
      // Record count accumulates during the same pass that serializes the
      // payloads — no second scan. (Accumulator may over-count on task
      // retry; exact once-only counts belong to the broker's offsets.)
      val acc = df.sparkSession.sparkContext.longAccumulator("graft.kafka.records")
      AvroIo.kafkaPayload(df, recordCounter = Some(acc)).write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("topic", topic)
        .save()
      acc.value
    }
  }

  /** Offline stand-in: produces the SAME Avro payloads as [[KafkaSink]]
    * (so tests can decode them) and counts instead of sending. */
  final class LogKafkaSink extends KafkaLike {
    /** The payload column a broker would receive. */
    def payloads(df: DataFrame): DataFrame = AvroIo.kafkaPayload(df)
    override def publish(df: DataFrame, topic: String): Long = {
      import org.apache.spark.sql.functions.{coalesce, count, lit, sum}
      val row = AvroIo.kafkaPayloadCounted(df)
        .agg(count(lit(1)), coalesce(sum("records"), lit(0L))).head()
      val (messages, records) = (row.getLong(0), row.getLong(1))
      System.err.println(
        s"[kafka-stub] topic=$topic avro-messages=$messages records=$records")
      records
    }
  }

  /** K3 PutSlack webhook (56409-tika.xml:1021): alert sink for the
    * bad/failure routes — offline stub logs the alert line. */
  final class LogSlackSink {
    def alert(df: DataFrame, channel: String, limit: Int = 10): Long = {
      val n = df.count()
      System.err.println(s"[slack-stub] channel=$channel alerts=$n " +
        s"sample=${df.take(math.min(limit, 3)).mkString("; ")}")
      n
    }
  }
}
