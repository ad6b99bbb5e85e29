package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite SUFFIX window frames
  * (`ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING`) into RUNNING
  * frames over the REVERSED sort order.
  *
  * Why this matters at scale: Spark evaluates an unbounded-FOLLOWING
  * frame by re-scanning from each row to the partition end —
  * O(n²) per partition (`UnboundedFollowingWindowFunctionFrame`) —
  * while a running (unbounded-PRECEDING) frame accumulates
  * incrementally in O(n). The two are equivalent for
  * order-insensitive aggregates (min/max/sum/count/average) and for
  * first↔last (swapped), because reversing a total order turns every
  * suffix into a prefix. This engine hit the pathology in production
  * shape: a nullable window key concentrated 47k rows in ONE partition
  * and a 2-column fill-up went quadratic — 90 s of a 122 s pipeline
  * (PLANS.md round-9). The library's own operators ([[graft.ops.Fills]],
  * [[graft.ops.AsOf.attachNextMarker]]) are written in the O(n) form
  * directly; this rule is the engine-level safety net that gives ANY
  * user query (Column API or SQL text) the linear plan automatically.
  *
  * Scope: a [[Window]] node rewrites only when EVERY window expression
  * in it is a suffix-frame ROW aggregate with an order-reversal
  * equivalent — the node-level sort order must flip, so one
  * non-rewritable expression keeps the node as written. First/Last on
  * tied sort keys are non-deterministic in Spark with or without the
  * rewrite; order-insensitive aggregates are exact regardless.
  */
object RewriteSuffixWindowFrames extends Rule[LogicalPlan] {

  private val suffixFrame =
    SpecifiedWindowFrame(RowFrame, CurrentRow, UnboundedFollowing)
  private val runningFrame =
    SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)

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

  /** The aggregate evaluated over the reversed prefix, if equivalent. */
  private def flip(f: AggregateFunction): Option[AggregateFunction] = f match {
    case First(c, ign) => Some(Last(c, ign))
    case Last(c, ign) => Some(First(c, ign))
    case _: Min | _: Max | _: Sum | _: Count | _: Average => Some(f)
    case _ => None
  }

  private def rewritable(ne: NamedExpression): Boolean = ne match {
    case Alias(WindowExpression(ae: AggregateExpression,
        WindowSpecDefinition(_, _, `suffixFrame`)), _) =>
      flip(ae.aggregateFunction).isDefined
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case w @ Window(wes, part, order, child, hint)
        if order.nonEmpty && wes.nonEmpty && wes.forall(rewritable) =>
      val newExprs = wes.map {
        case a @ Alias(WindowExpression(ae: AggregateExpression,
            spec @ WindowSpecDefinition(_, specOrder, _)), name) =>
          val flipped = ae.copy(aggregateFunction = flip(ae.aggregateFunction).get)
          Alias(
            WindowExpression(flipped,
              spec.copy(orderSpec = specOrder.map(reverse),
                frameSpecification = runningFrame)),
            name)(a.exprId, a.qualifier, a.explicitMetadata,
              a.nonInheritableMetadataKeys)
        case other => other // unreachable: guarded by forall(rewritable)
      }
      Window(newExprs, part, order.map(reverse), child, hint)
  }
}
