package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{FloatDot, LongL2, MinGramHash60, MinHashes60, SpanHashes60}

/** Engine extension point (`spark.sql.extensions=graft.GraftExtensions`,
  * wired in GraftSession.configure): registers the engine's native
  * Catalyst expressions so they are callable from SQL and `expr(...)` in
  * any session — the idiomatic way to ship custom codegen'd functions
  * without forking Spark.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
      (children: Seq[Expression]) => FloatDot(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("long_l2"),
      new ExpressionInfo(classOf[LongL2].getName, "long_l2"),
      (children: Seq[Expression]) => LongL2(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("min_gram_hash60"),
      new ExpressionInfo(classOf[MinGramHash60].getName, "min_gram_hash60"),
      (children: Seq[Expression]) => MinGramHash60(children.head)))
    ext.injectFunction((
      FunctionIdentifier("span_hashes60"),
      new ExpressionInfo(classOf[SpanHashes60].getName, "span_hashes60"),
      (children: Seq[Expression]) => SpanHashes60(children.head)))
    ext.injectFunction((
      FunctionIdentifier("min_hashes60"),
      new ExpressionInfo(classOf[MinHashes60].getName, "min_hashes60"),
      (children: Seq[Expression]) => MinHashes60(children.head, children(1))))
  }
}
