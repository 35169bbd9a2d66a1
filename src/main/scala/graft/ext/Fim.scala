package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fill-in-the-middle training transform (Bavarian et al. 2022): cut
  * each document at two md5-chosen token positions and emit the PSM
  * reordering `<PRE> prefix <SUF> suffix <MID> middle` — the data-side
  * transformation that teaches a causal LM to infill.
  *
  * Determinism: both cut points derive from the repo's md5 selector
  * arithmetic over (id, tag) — c1 uniform in [0, n], c2 uniform in
  * [c1, n] — so shards are reproducible and the DuckDB oracle replays
  * the cuts exactly (1-based list slicing mirrors Spark's `slice`).
  *
  * Scale shape: map-only over one materialized token array; the three
  * spans are slices, the output one array concat + join. No shuffle. */
object Fim {

  /** (idCol, fim_text, c1, c2): the PSM string plus the cut points for
    * auditability. Documents shorter than 2 tokens still transform
    * (possibly-empty spans; the sentinels always emit). */
  def psmFrame(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df.select(col(idCol), split(col(textCol), " ").as("a"))
      .withColumn("n", size(col("a")).cast("long"))
    def key(tag: String) =
      concat(col(idCol).cast("string"), lit(s":$tag"))
    val c1 = Sampling.u32(key("fim1")) % (col("n") + 1)
    val withC1 = base.withColumn("c1", c1)
    val c2 = col("c1") + Sampling.u32(key("fim2")) % (col("n") - col("c1") + 1)
    val withC2 = withC1.withColumn("c2", c2)
    val pre = slice(col("a"), lit(1), col("c1").cast("int"))
    val mid = slice(col("a"), (col("c1") + 1).cast("int"),
      (col("c2") - col("c1")).cast("int"))
    val suf = slice(col("a"), (col("c2") + 1).cast("int"),
      (col("n") - col("c2")).cast("int"))
    withC2.select(col(idCol),
      array_join(
        concat(array(lit("<PRE>")), pre, array(lit("<SUF>")), suf,
          array(lit("<MID>")), mid), " ").as("fim_text"),
      col("c1"), col("c2"))
  }

  /** The identical computation as DuckDB SQL over `table(idCol, textCol)`. */
  def oracleSql(table: String, idCol: String, textCol: String): String = {
    def h(tag: String) =
      s"CAST('0x' || substr(md5(CAST($idCol AS VARCHAR) || ':$tag'), 1, 8) AS BIGINT)"
    s"""WITH t AS (
       |  SELECT $idCol, string_split($textCol, ' ') AS a,
       |         CAST(len(string_split($textCol, ' ')) AS BIGINT) AS n
       |  FROM $table),
       |c AS (
       |  SELECT *, ${h("fim1")} % (n + 1) AS c1 FROM t),
       |c2t AS (
       |  SELECT *, c1 + ${h("fim2")} % (n - c1 + 1) AS c2 FROM c)
       |SELECT $idCol,
       |  array_to_string(
       |    ['<PRE>'] || a[1:CAST(c1 AS INT)]
       |      || ['<SUF>'] || a[CAST(c2 AS INT) + 1:CAST(n AS INT)]
       |      || ['<MID>'] || a[CAST(c1 AS INT) + 1:CAST(c2 AS INT)],
       |    ' ') AS fim_text,
       |  c1, c2
       |FROM c2t ORDER BY $idCol""".stripMargin
  }
}
