package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BERT-style MLM training-pair construction (Devlin et al. 2019
  * §3.1): select ~15% of token positions; of those, 80% become
  * `[MASK]`, 10% a random replacement token, 10% stay verbatim — and
  * the targets record what each selected position originally held.
  *
  * Determinism: every per-position decision derives from the repo's
  * md5 selector arithmetic over `(id, position, tag)` — no RNG, so
  * the pairs are reproducible shard-by-shard and the DuckDB oracle
  * replays them exactly. The "random" replacement draws from the
  * DOCUMENT'S OWN tokens at an md5-chosen position, which keeps the
  * draw self-contained (no external vocabulary relation to broadcast
  * or mirror) while still decorrelating the replacement from the
  * masked slot.
  *
  * Scale shape: map-only — one projection materializes the token
  * array (the LinearGate lesson: array-consuming lambdas re-evaluate
  * expression operands per element, so `element_at` indexing must hit
  * a materialized column, never an inline split), then every mask
  * decision is column arithmetic over it. No shuffle, no state. */
object MlmMask {

  /** Percent of token positions selected for prediction. */
  val SelPct = 15L
  /** Of 10 selected slots: 0–7 mask, 8 random-replace, 9 keep. */
  val MaskOf10 = 8L

  /** (idCol, masked_text, targets): masked_text is the input with the
    * selected positions rewritten per the 80/10/10 rule; targets is
    * "pos=token" for every selected position, space-joined. ONE
    * annotation pass computes each position's selection hash once
    * (both emitted columns project from the materialized annotated
    * array — positions come from the array itself, never
    * sequence(0, n-1), whose n=0 case is the DESCENDING [0, -1]). */
  def maskFrame(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // coalesce NULL text to '' as the sibling operators (Fim,
    // LinearGate) do — the oracle's coalesce(array_to_string(...), '')
    // maps a NULL-text row to '', so split(NULL) must not propagate
    val base = df.select(col(idCol),
        split(coalesce(col(textCol), lit("")), " ").as("a"))
      .withColumn("n", size(col("a")))
    def key(i: Column) =
      concat(col(idCol).cast("string"), lit(":"), i.cast("string"))
    def sel(i: Column) = Sampling.u32(key(i), lit(":sel")) % 100 < lit(SelPct)
    def op(i: Column) = Sampling.u32(key(i), lit(":op")) % 10
    def pick(i: Column) = (Sampling.u32(key(i), lit(":pick")) % col("n")).cast("int")
    val ann = transform(col("a"), (x, i) =>
      struct(sel(i).as("s"), i.as("i"), x.as("x"),
        when(sel(i),
          when(op(i) < lit(MaskOf10), lit("[MASK]"))
            .when(op(i) === lit(MaskOf10), element_at(col("a"), pick(i) + 1))
            .otherwise(x))
          .otherwise(x).as("m")))
    base.withColumn("ann", ann).select(col(idCol),
      array_join(transform(col("ann"), e => e.getField("m")), " ")
        .as("masked_text"),
      array_join(
        transform(filter(col("ann"), e => e.getField("s")),
          e => concat(e.getField("i").cast("string"), lit("="), e.getField("x"))),
        " ").as("targets"))
  }

  /** The identical computation as DuckDB SQL over `table(idCol, textCol)`. */
  def oracleSql(table: String, idCol: String, textCol: String): String = {
    def h(tag: String) =
      s"CAST('0x' || substr(md5(CAST($idCol AS VARCHAR) || ':' || " +
        s"CAST(j - 1 AS VARCHAR) || ':$tag'), 1, 8) AS BIGINT)"
    // coalesce both joins: DuckDB's array_to_string is NULL on an
    // empty list where Spark's array_join is '' (no-selection docs)
    s"""WITH t AS (
       |  SELECT $idCol, string_split($textCol, ' ') AS a,
       |         len(string_split($textCol, ' ')) AS n
       |  FROM $table)
       |SELECT $idCol,
       |  coalesce(array_to_string(list_transform(range(1, n + 1), j ->
       |    CASE WHEN ${h("sel")} % 100 < $SelPct
       |      THEN CASE WHEN ${h("op")} % 10 < $MaskOf10 THEN '[MASK]'
       |                WHEN ${h("op")} % 10 = $MaskOf10
       |                  THEN a[CAST(${h("pick")} % n AS INT) + 1]
       |                ELSE a[j] END
       |      ELSE a[j] END), ' '), '') AS masked_text,
       |  coalesce(array_to_string(list_transform(
       |    list_filter(range(1, n + 1), j -> ${h("sel")} % 100 < $SelPct),
       |    j -> CAST(j - 1 AS VARCHAR) || '=' || a[j]), ' '), '') AS targets
       |FROM t ORDER BY $idCol""".stripMargin
  }
}
