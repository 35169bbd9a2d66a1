package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric int8 scalar quantization of embedding vectors — the ×4
  * memory/IO lever for similarity search at corpus scale: a 100 TB
  * float32 embedding store becomes 25 TB of int8 + one double scale
  * per vector, and candidate generation (LSH buckets, IVF cells) works
  * on the quantized form with exact re-rank only on survivors.
  *
  * Scheme: per-vector symmetric — `scale = 127 / max|v_i|`,
  * `q_i = floor(v_i * scale + 0.5)` (explicit half-up floor: both
  * Spark's and DuckDB's `round()` tie-break differently across engines,
  * `floor(x + 0.5)` is one IEEE expression with identical bits in
  * both). Dequantization is `q_i / scale`; cosine is scale-invariant,
  * so quantized-form cosine ≈ original cosine to O(1/254) per element.
  *
  * Scale shape: a narrow map — per-vector max, transform, no shuffle.
  * The higher-order `transform` here is interpreted, not codegen'd:
  * it runs once per VECTOR (not per candidate pair, unlike DotProduct),
  * so the boxing cost is a one-time encode, amortized across every
  * downstream probe of the quantized store.
  */
object Quantize {

  /** Adds (`scale`: double, `qvec`: array<int> in [-127, 127]) to `df`.
    * qvec stays int-typed (not tinyint) so downstream integer sums
    * can't overflow mid-plan; the storage cast to byte is the writer's
    * one-line concern. All-zero vectors quantize to all-zero with
    * scale 0 (the dequantized form is exact for them). */
  def int8(df: DataFrame, vecCol: String): DataFrame = {
    require(!df.columns.contains("scale") && !df.columns.contains("qvec"),
      "int8 emits 'scale' and 'qvec' columns; rename the input's first")
    val v = transform(col(vecCol), x => x.cast("double"))
    val maxabs = array_max(transform(v, x => abs(x)))
    val scale = when(maxabs > 0.0, lit(127.0) / maxabs).otherwise(lit(0.0))
    // explode(array(·)) emits scale through a Generate node — an
    // optimizer barrier. A plain withColumn alias is referenced once by
    // the qvec lambda, so CollapseProject INLINES it into the lambda
    // body and the array_max re-evaluates per ELEMENT (O(d²)/vector,
    // plan-verified); behind Generate it binds once per row.
    df.select(col("*"), explode(array(scale)).as("scale"))
      .withColumn("qvec",
        transform(v, x => floor(x * col("scale") + 0.5).cast("int")))
  }

  /** cosine(original, dequantized) — scale-invariant, so it compares
    * the original against the quantized INTEGER vector directly; uses
    * the codegen'd DotProduct. */
  def reconCosine(vecCol: String, qvecCol: String): Column = {
    def dot(a: Column, b: Column) = graft.functions.DotProduct.dotCol(a, b)
    val v = col(vecCol)
    val q = col(qvecCol)
    dot(v, q) / sqrt(dot(v, v) * dot(q, q))
  }
}
