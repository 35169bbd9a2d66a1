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

  /** Johnson–Lindenstrauss random projection to `dOut` dims with a
    * Rademacher (±1) sign matrix — the dimensionality-reduction step
    * before LSH/ANN when the embedding width itself is the cost. Two
    * determinism devices make it oracle-mirrorable:
    *
    *   - the sign matrix derives from md5("i_k") first-hex-digit
    *     parity, so DuckDB rebuilds the IDENTICAL matrix in SQL (same
    *     md5, same strings) — no RNG state anywhere;
    *   - inputs are fixed-point quantized first (floor(x·2^20) —
    *     power-of-two scaling is exact in IEEE doubles), so every
    *     projection sum is INTEGER arithmetic: order-free, no float
    *     summation drift between engines or partitionings.
    *
    * Map-only, no shuffle. Emits (idCol, k, p) — one row per output
    * dimension; ±1 signs keep E[p·p'] proportional to the original
    * dot product (the JL guarantee). The quantized vector binds once
    * per row behind a Generate barrier (see int8's CollapseProject
    * note — inlined, the transform would re-evaluate per (k, i)). */
  def jlProject(df: DataFrame, idCol: String, vecCol: String,
                dIn: Int, dOut: Int): DataFrame =
    jlProjectVec(df, idCol, vecCol, dIn, dOut)
      .select(col(idCol), posexplode(col("pvec")).as(Seq("k", "p")))

  /** [[jlProject]] in vector form: (idCol, pvec: array<long> of length
    * dOut) — the shape the ANN family consumes (cosine on the integer
    * projections directly; scale-invariant like the int8 path). */
  def jlProjectVec(df: DataFrame, idCol: String, vecCol: String,
                   dIn: Int, dOut: Int): DataFrame = {
    require(!df.columns.contains("__q") && !df.columns.contains("pvec"),
      "jlProjectVec uses '__q' and emits 'pvec'; rename the input's first")
    val signs: Array[Long] = Array.tabulate(dOut * dIn) { idx =>
      val k = idx / dIn
      val i = idx % dIn
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${i}_${k}".getBytes("UTF-8"))
      // first hex digit 0-7 → +1, 8-f → -1 (top bit of the first byte)
      if ((h(0) & 0x80) == 0) 1L else -1L
    }
    val signsLit = typedlit(signs)
    val q = transform(col(vecCol),
      x => floor(x.cast("double") * lit(1048576.0)).cast("long"))
    df.select(col(idCol), explode(array(q)).as("__q"))
      .select(col(idCol),
        transform(sequence(lit(0), lit(dOut - 1)), k =>
          aggregate(sequence(lit(0), lit(dIn - 1)), lit(0L), (acc, i) =>
            acc + element_at(col("__q"), i + 1) *
              element_at(signsLit, k * dIn + i + 1))).as("pvec"))
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
