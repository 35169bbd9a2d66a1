package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

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

  /** Builder for every registration/column site: wraps both children
    * in Cast (the DotProduct.build pattern) so an INT key widens and
    * an uncastable input fails ANALYSIS — without this, a foldable
    * integer literal reaches nullSafeEval's `asInstanceOf[Long]`
    * during constant folding and classcasts instead. */
  def build(sketch: Expression, key: Expression): BloomMightContain =
    BloomMightContain(Cast(sketch, BinaryType), Cast(key, LongType))

  /** Per-thread identity memo, bounded at [[memoCap]] entries: within
    * a task each sketch literal is one stable array reference, so a
    * lookup is at most [[memoCap]] pointer compares. More than one
    * slot matters when screens CHAIN — two `bloom_might_contain`
    * calls with different sketches collapse into one codegen'd stage
    * and alternate per row, and a 1-entry memo would ping-pong
    * through a full sketch deserialization on every call. The buffer
    * is held through a SoftReference so finished queries' filters
    * (GB-scale at the 10⁹-member sizing) are GC-reclaimable under
    * pressure, not pinned per task thread for the executor's
    * lifetime; the next bloom query simply re-deserializes. */
  private val memoCap = 4
  private val memo = new ThreadLocal[java.lang.ref.SoftReference[
    scala.collection.mutable.ArrayBuffer[
      (Array[Byte], org.apache.spark.util.sketch.BloomFilter)]]]

  def might(sketch: Array[Byte], key: Long): Boolean = {
    val ref = memo.get()
    var buf = if (ref == null) null else ref.get()
    if (buf == null) {
      buf = scala.collection.mutable.ArrayBuffer.empty
      memo.set(new java.lang.ref.SoftReference(buf))
    }
    var i = 0
    while (i < buf.length && (buf(i)._1 ne sketch)) i += 1
    val bf =
      if (i < buf.length) buf(i)._2
      else {
        val f = org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(sketch))
        if (buf.length >= memoCap) buf.remove(0) // evict oldest
        buf += ((sketch, f))
        f
      }
    bf.mightContainLong(key)
  }

  /** Column API: `sketch` must be a binary column (normally a literal
    * holding `BloomFilter.writeTo` bytes), `key` a long column. */
  def bloom_might_contain(sketch: Column, key: Column): Column =
    ColumnBridge.column(build(
      ColumnBridge.expression(sketch), ColumnBridge.expression(key)))
}
