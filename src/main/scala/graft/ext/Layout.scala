package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout keys for multi-dimensional clustering — the Z-order
  * (Morton) interleave lakehouse table formats sort by so range
  * predicates on EITHER dimension touch a bounded band of files
  * (zone-map pruning works on both columns at once, where a plain sort
  * only serves its leading column).
  *
  * The Spark column and the DuckDB mirror are generated from the SAME
  * index loop, so the two engines are symmetric by construction: bit i
  * of `a` lands at position 2i+1, bit i of `b` at 2i, for 16 bits each
  * → a 32-bit Morton code. All operations are integer shifts/masks —
  * bit-exact everywhere.
  */
object Layout {

  val Bits = 16

  /** 32-bit Morton interleave of the low 16 bits of `a` and `b`
    * (callers pre-mask, e.g. `col % 65536`). */
  def zorderCol(a: Column, b: Column): Column =
    (0 until Bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_.bitwiseOR(_))

  /** The identical interleave as DuckDB SQL over column expressions. */
  def zorderSql(aExpr: String, bExpr: String): String =
    (0 until Bits).map { i =>
      s"(((($aExpr) >> $i) & 1) << ${2 * i + 1}) | (((($bExpr) >> $i) & 1) << ${2 * i})"
    }.mkString("(", " | ", ")")
}
