package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, DecimalType, DoubleType, FloatType}

/** Optimizer rule: rewrite SUFFIX window frames
  * (`ROWS BETWEEN <x> AND UNBOUNDED FOLLOWING` for any row lower
  * bound, and the no-offset RANGE form) into RUNNING frames over the
  * REVERSED sort order.
  *
  * Why this matters at scale: Spark evaluates an unbounded-FOLLOWING
  * frame by re-scanning from each row to the partition end —
  * O(n²) per partition (`UnboundedFollowingWindowFunctionFrame`) —
  * while a running (unbounded-PRECEDING) frame accumulates
  * incrementally in O(n). The two are equivalent for
  * order-insensitive aggregates and for first↔last (swapped), because
  * reversing a total order turns every suffix into a prefix. This
  * engine hit the pathology in production shape: a nullable window key
  * concentrated 47k rows in ONE partition and a 2-column fill-up went
  * quadratic — 90 s of a 122 s pipeline (PLANS.md round-9). The
  * library's own operators ([[graft.ops.Fills]],
  * [[graft.ops.AsOf.attachNextMarker]]) are written in the O(n) form
  * directly; this rule is the engine-level safety net that gives ANY
  * user query (Column API or SQL text) the linear plan automatically.
  *
  * Eligibility per aggregate: first/last swap; min/max/count are exact
  * under any accumulation order; Sum flips only over NON-floating
  * inputs — reversing a float/double accumulation can change low-order
  * bits, and in an engine whose oracles pin bit-exact output a silent
  * ulp drift against vanilla Spark is a wrong answer, not an
  * optimization. Integral and decimal sums are exact in any order.
  * Average is stricter: Spark accumulates every NON-DECIMAL input
  * (ints and longs included) in a DoubleType sum buffer, so partial
  * sums past 2^53 drift under reordering just like float Sum — only
  * DecimalType inputs (decimal sum buffer, order-exact) flip.
  * First/Last on tied sort keys are non-deterministic in Spark with or
  * without the rewrite.
  *
  * A node whose expressions are ALL eligible flips in place. A MIXED
  * node SPLITS: the eligible expressions move to a new Window over the
  * reversed order (linear), the rest stay on a Window with the written
  * order stacked above it (windowed columns are independent — each
  * sees only the child's rows), and a Project restores the original
  * output order (parents resolve by exprId, but top-level column order
  * is positional). Pre-split, one `collect_list` kept a whole fill-up
  * node quadratic.
  */
object RewriteSuffixWindowFrames extends Rule[LogicalPlan] {

  /** The frame evaluated over the reversed order that covers the SAME
    * row set, if one exists. Any `... AND UNBOUNDED FOLLOWING` frame
    * hits Spark's O(n²) suffix evaluator, and every ROW-frame lower
    * bound negates cleanly under order reversal:
    * `[x FOLLOWING, ∞)` ≡ reversed `(-∞, x PRECEDING]` (CurrentRow is
    * its own negation; an integer offset flips sign). A RANGE suffix
    * frame reverses only in the no-offset form — peer sets are
    * direction-symmetric but offset range bounds are VALUE arithmetic,
    * which does not reverse. A frame whose lower bound is already
    * UNBOUNDED PRECEDING is the whole partition — O(n) in Spark,
    * nothing to fix. */
  private def flipFrame(f: WindowFrame): Option[SpecifiedWindowFrame] = f match {
    case SpecifiedWindowFrame(RowFrame, lower, UnboundedFollowing) =>
      lower match {
        case CurrentRow =>
          Some(SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
        case Literal(v: Int, dt) =>
          Some(SpecifiedWindowFrame(RowFrame, UnboundedPreceding, Literal(-v, dt)))
        case Literal(v: Long, dt) =>
          Some(SpecifiedWindowFrame(RowFrame, UnboundedPreceding, Literal(-v, dt)))
        case _ => None
      }
    case SpecifiedWindowFrame(RangeFrame, CurrentRow, UnboundedFollowing) =>
      Some(SpecifiedWindowFrame(RangeFrame, UnboundedPreceding, CurrentRow))
    case _ => None
  }

  private def reverse(so: SortOrder): SortOrder = {
    val dir = so.direction match {
      case Ascending => Descending
      case Descending => Ascending
    }
    val nulls = so.nullOrdering match {
      case NullsFirst => NullsLast
      case NullsLast => NullsFirst
    }
    SortOrder(so.child, dir, nulls, Seq.empty)
  }

  private def isFloating(dt: DataType): Boolean =
    dt == FloatType || dt == DoubleType

  /** The aggregate evaluated over the reversed prefix, if exactly
    * equivalent (see eligibility rules in the object scaladoc). */
  private def flip(f: AggregateFunction): Option[AggregateFunction] = f match {
    case First(c, ign) => Some(Last(c, ign))
    case Last(c, ign) => Some(First(c, ign))
    case s: Sum if !isFloating(s.child.dataType) => Some(f)
    // Average's sum buffer is DoubleType for every non-decimal input
    // (org.apache.spark.sql.catalyst.expressions.aggregate.Average:
    // sumDataType) — an int/long average past 2^53 of partial sum
    // drifts under reordering; only a decimal buffer is order-exact
    case a: Average if a.child.dataType.isInstanceOf[DecimalType] => Some(f)
    case _: Min | _: Max | _: Count => Some(f)
    case _ => None
  }

  private def rewritable(ne: NamedExpression): Boolean = ne match {
    case Alias(WindowExpression(ae: AggregateExpression,
        WindowSpecDefinition(_, _, frame)), _) =>
      flipFrame(frame).isDefined && flip(ae.aggregateFunction).isDefined
    case _ => false
  }

  /** Rebuild one eligible expression as its flipped running-frame
    * twin, preserving the alias exprId so parents re-resolve. */
  private def toRunning(ne: NamedExpression): NamedExpression = ne match {
    case a @ Alias(WindowExpression(ae: AggregateExpression,
        spec @ WindowSpecDefinition(_, specOrder, frame)), name) =>
      val flipped = ae.copy(aggregateFunction = flip(ae.aggregateFunction).get)
      Alias(
        WindowExpression(flipped,
          spec.copy(orderSpec = specOrder.map(reverse),
            frameSpecification = flipFrame(frame).get)),
        name)(a.exprId, a.qualifier, a.explicitMetadata,
          a.nonInheritableMetadataKeys)
    case other => other // unreachable: callers filter by rewritable
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case w @ Window(wes, part, order, child, hint)
        if order.nonEmpty && wes.nonEmpty && wes.exists(rewritable) =>
      val (eligible, rest) = wes.partition(rewritable)
      val linear =
        Window(eligible.map(toRunning), part, order.map(reverse), child, hint)
      if (rest.isEmpty) linear
      else Project(w.output, Window(rest, part, order, linear, hint))
  }
}
