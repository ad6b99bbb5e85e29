package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{FloatVectorDot, NormalizeAscii}

/** The engine's `SparkSessionExtensions` entry point (SURVEY §7.3 tier
  * (c)): registers native expressions into the SQL function registry so
  * `spark.sql` text queries reach the same codegen'd implementations as
  * the Column API. Activated by `GraftSession.builder` via
  * `spark.sql.extensions=graft.GraftExtensions`; usable standalone by
  * any session builder the same way.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(
        classOf[FloatVectorDot].getName, null, "vec_dot",
        "vec_dot(a, b) - dot product of two array<float> columns " +
          "(double accumulation, codegen'd)", ""),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_dot takes exactly 2 arguments")
        FloatVectorDot(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("norm_text"),
      new ExpressionInfo(
        classOf[NormalizeAscii].getName, null, "norm_text",
        "norm_text(s) - one-pass ASCII normalize: lowercase, keep " +
          "[a-z0-9 ], collapse spaces (codegen'd)", ""),
      (children: Seq[Expression]) => {
        require(children.length == 1, "norm_text takes exactly 1 argument")
        NormalizeAscii(children.head)
      }))
  }
}
