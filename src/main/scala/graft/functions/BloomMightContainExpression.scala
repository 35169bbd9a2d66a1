package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}

/** `bloom_might_contain(sketchBytes, key)` — Bloom-filter membership as
  * a codegen'd Catalyst expression (the DetectMime/DotProduct pattern),
  * replacing the boxed per-row UDF that previously closed over the
  * driver-side filter object.
  *
  * The serialized sketch rides the plan as a binary LITERAL (one
  * object in the task's references array — shipped once per task, like
  * the UDF's closure was), and the per-row call passes the raw
  * `byte[]` + primitive long straight through whole-stage codegen: no
  * encoder round-trip, no codegen fence. Deserialization happens once
  * per (thread, sketch) via an identity memo — the literal's array
  * reference is stable across a task's rows, so the per-row cost after
  * the first row is one reference comparison.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(sketch: Any, key: Any): Any =
    BloomMightContain.might(sketch.asInstanceOf[Array[Byte]],
      key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, k) =>
      s"graft.functions.BloomMightContain.might($s, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {

  /** Per-thread 1-entry identity memo: within a task the sketch
    * literal is one stable array reference, so after the first row
    * this is a pointer compare. A content-keyed map would hash the
    * whole (potentially MB-scale) sketch per row; identity is the
    * right key here. The entry is held through a SoftReference so a
    * finished query's filter (GB-scale at the 10⁹-member sizing)
    * does not stay pinned in every task thread that touched it for
    * the executor's lifetime — the GC reclaims it under pressure,
    * and the next bloom query simply re-deserializes. */
  private val memo = new ThreadLocal[
    java.lang.ref.SoftReference[(Array[Byte], org.apache.spark.util.sketch.BloomFilter)]]

  def might(sketch: Array[Byte], key: Long): Boolean = {
    val ref = memo.get()
    var e = if (ref == null) null else ref.get()
    if (e == null || (e._1 ne sketch)) {
      e = (sketch, org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(sketch)))
      memo.set(new java.lang.ref.SoftReference(e))
    }
    e._2.mightContainLong(key)
  }

  /** Column API: `sketch` must be a binary column (normally a literal
    * holding `BloomFilter.writeTo` bytes), `key` a long column. */
  def bloom_might_contain(sketch: Column, key: Column): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(sketch), ColumnBridge.expression(key)))
}
