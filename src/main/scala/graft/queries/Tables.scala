package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  * One parquet file per table under the scale-factor dir.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The generated `events.ts` has shipped as BOTH parquet
    * TIMESTAMP(NANOS) (read as epoch-nanos LONG under `nanosAsLong`)
    * and TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ) across testdata
    * regenerations — the 2026-08-13 regen silently flipped nanos →
    * micros and every `ts div 1000` site failed analysis. Normalize by
    * TYPE, not by assumption: whatever the physical unit, `ts` comes
    * out as epoch-NANOS LONG (the long form keeps integer `div`
    * arithmetic exact; micros→nanos ×1000 cannot overflow until year
    * 2262). The UTC session makes the NTZ cast same-instant, matching
    * DuckDB's naive `epoch_ns(ts)` on the oracle side. Works on batch
    * and streaming frames alike (pure projection). */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ => df.withColumn("ts",
        org.apache.spark.sql.functions.expr(
          "unix_micros(cast(ts as timestamp)) * 1000L"))
    }

  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame     =
    normalizeEventTs(load(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
