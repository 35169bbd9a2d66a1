package graft.pipeline

import org.apache.spark.sql.DataFrame

/** A1 MergeContent (56409-tika.xml:1325-1362): bin-packing micro-batcher
  * — 5..15000 records per bin, ≤5 bins. In Spark this is a *physical*
  * concern (output file sizing), not a semantic aggregate: map the bin
  * config to a partition count before write. At 100 TB the same policy
  * is expressed per-partition by AQE coalescing + maxRecordsPerFile
  * rather than a global count() — both paths provided.
  */
object MergePolicy {
  final case class BinConfig(minEntries: Long = 5, maxEntries: Long = 15000, maxBins: Int = 5)

  /** Partition count for a known/estimated row count. */
  def partitionsFor(rows: Long, cfg: BinConfig = BinConfig()): Int = {
    if (rows <= 0) 1
    else {
      val byMax = math.ceil(rows.toDouble / cfg.maxEntries).toInt
      math.max(1, math.min(byMax, cfg.maxBins))
    }
  }

  /** Exact form: counts (one extra job) then coalesces. Fine for sink
    * batches; prefer [[writeSized]] for large writes. */
  def apply(df: DataFrame, cfg: BinConfig = BinConfig()): DataFrame =
    df.coalesce(partitionsFor(df.count(), cfg))

  /** Scale form: no count — bound records per output file and let AQE
    * size the shuffle-free write. */
  def writeSized(df: DataFrame, dir: String, cfg: BinConfig = BinConfig(),
                 format: String = "parquet"): Unit =
    df.write.mode("ignore").format(format)
      .option("maxRecordsPerFile", cfg.maxEntries)
      .save(dir)
}
