package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/**
 * Exact intersection size of two SORTED long arrays in one compiled
 * two-pointer merge — the verify kernel for shingle-set containment
 * ([[graft.operators.Dedup.containmentDupPairs]]).
 *
 * [[ShingleHashes]] already emits sorted distinct hashes, so the
 * built-in `size(array_intersect(a, b))` pays for machinery this input
 * does not need: `ArrayIntersect` builds a hash set per ROW and boxes
 * every element, which is the dominant cost when tens of millions of
 * candidate pairs stream through the verify filter. This merge is
 * allocation-free, branch-cheap (`O(|a| + |b|)` comparisons), and
 * inlines into the enclosing whole-stage-codegen span.
 *
 * CALLER CONTRACT: both arrays ascending-sorted (duplicates allowed —
 * matched positionally like multiset intersection of equal runs; on the
 * distinct arrays the callers pass, the count is exactly `|A ∩ B|`).
 */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<bigint> arguments, got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectCount.count($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Two-pointer merge count over sorted long arrays (static so the
    * generated code calls it without an instance). */
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}
