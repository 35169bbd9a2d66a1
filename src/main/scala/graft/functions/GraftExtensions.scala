package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration (SURVEY.md §7.4 path (c) plumbing):
  * installs the engine's native expressions into every session built
  * with `.withExtensions(new GraftExtensions)` — or via config
  * `spark.sql.extensions=graft.functions.GraftExtensions`, which is
  * how a cluster deployment would pick them up without code changes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("detect_mime"),
      new ExpressionInfo(classOf[DetectMime].getName, "detect_mime"),
      (exprs: Seq[Expression]) => DetectMime(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct.build(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      (exprs: Seq[Expression]) => BloomMightContain.build(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
      (exprs: Seq[Expression]) => UnicodeNormalize.fromExprs(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("fix_mojibake"),
      new ExpressionInfo(classOf[FixMojibake].getName, "fix_mojibake"),
      (exprs: Seq[Expression]) => FixMojibake(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("luhn_redact"),
      new ExpressionInfo(classOf[LuhnRedact].getName, "luhn_redact"),
      (exprs: Seq[Expression]) => LuhnRedact(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("token_set_count"),
      new ExpressionInfo(classOf[TokenSetCount].getName, "token_set_count"),
      (exprs: Seq[Expression]) => exprs(1) match {
        // the word set is part of the EXPRESSION (compiled into codegen),
        // so the SQL form takes it as a comma-separated string literal
        case org.apache.spark.sql.catalyst.expressions.Literal(
            s: org.apache.spark.unsafe.types.UTF8String, _) =>
          TokenSetCount(exprs.head,
            s.toString.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
        case _ => throw new IllegalArgumentException(
          "token_set_count(text, 'w1,w2,…') requires a literal word list")
      }))
  }
}
