package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/**
 * Logical node for the explicit nearest-interval-join API.
 *
 * Unlike the conf-gated path (algorithm=nearest rewriting an Inner Join,
 * mirroring the reference's CoitreesNearest switch,
 * reference: sequila-core/src/session_context.rs:53), this node carries the
 * correct output schema: the left (build) side is nullable because probe
 * rows with no key match are NULL-padded. It also keeps the optimizer from
 * reasoning with Inner-join constraints that nearest semantics violate
 * (emitted pairs need not satisfy the overlap condition).
 */
case class NearestIntervalJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    condition: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output.map(_.withNullability(true)) ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): NearestIntervalJoin =
    copy(left = newLeft, right = newRight)
}
