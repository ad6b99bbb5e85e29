package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two numeric array columns
  * (`array<float>` / `array<double>`, independently per side) with
  * sequential double accumulation.
  *
  * This is the engine's demonstration of the custom-`Expression` tier
  * (SURVEY §7.3): the same computation via
  * `aggregate(zip_with(...))` builds per-row lambda closures and breaks
  * whole-stage codegen; this expression generates a tight primitive
  * loop inside the WSCG stage. Accumulation order (left-to-right,
  * doubles) is identical to the higher-order-function formulation, so
  * results are bit-for-bit unchanged — including for double-typed
  * hyperplane literals dotted against float embeddings (each element is
  * widened to double exactly, as in the HOF form).
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_dot"

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (elemType(left.dataType), elemType(right.dataType)) match {
      case (Some(_), Some(_)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>/array<double> arguments, got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  }

  private def get(x: ArrayData, dt: DataType, i: Int): Double = dt match {
    case FloatType => x.getFloat(i).toDouble
    case _         => x.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lt = elemType(left.dataType).get
    val rt = elemType(right.dataType).get
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += get(x, lt, i) * get(y, rt, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def getter(v: String, dt: DataType, idx: String): String =
        if (dt == FloatType) s"(double) $v.getFloat($idx)" else s"$v.getDouble($idx)"
      val la = getter(a, elemType(left.dataType).get, i)
      val rb = getter(b, elemType(right.dataType).get, i)
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $la * $rb;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorDot {
  /** Column API for [[FloatVectorDot]] (Spark 4 Column/Expression bridge). */
  def floatVectorDot(a: Column, b: Column): Column =
    GraftBridge.column(
      FloatVectorDot(GraftBridge.expression(a), GraftBridge.expression(b)))
}
