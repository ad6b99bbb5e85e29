package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: ASCII content normalization in one byte
  * pass — lowercase a–z, keep [a-z0-9 ], drop everything else, collapse
  * space runs.
  *
  * Semantically equal to the three-operator chain
  * `regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " ")`
  * for any input whose non-ASCII uppercase letters don't lowercase INTO
  * ASCII (the only such codepoint is U+212A KELVIN SIGN; U+0130 İ
  * lowercases to "i" + a combining dot that the strip then removes —
  * both chains drop the base char here instead). The regex chain walks
  * the document three times building two intermediate strings; this
  * expression is one pass, no intermediates, and stays inside
  * whole-stage codegen — the difference between regex speed and scan
  * speed over 100 TB of documents. Multi-byte UTF-8 sequences are
  * dropped wholesale (every byte has the high bit set, so no byte
  * collides with the ASCII keep-set).
  */
case class NormalizeAscii(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "norm_text"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeAscii.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NormalizeAscii$$.MODULE$$.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeAscii =
    copy(child = newChild)
}

object NormalizeAscii {

  /** One-pass normalize over the raw UTF-8 bytes (invoked from both the
    * interpreted and the generated code path). */
  def normalize(s: UTF8String): UTF8String = {
    val in = s.getBytes
    val out = new Array[Byte](in.length)
    var n = 0
    var prevSpace = false
    var i = 0
    while (i < in.length) {
      var b = in(i)
      if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        out(n) = b; n += 1; prevSpace = false
      } else if (b == ' ') {
        if (!prevSpace) { out(n) = b; n += 1 }
        prevSpace = true
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, n)
  }

  /** Column API. */
  def normText(c: Column): Column =
    GraftBridge.column(NormalizeAscii(GraftBridge.expression(c)))
}
