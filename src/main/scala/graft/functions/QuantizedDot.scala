package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/**
 * Exact integer dot product of two quantized `array<float>` embeddings:
 * each element maps to `round(x * scale)` (half away from zero — the
 * rule both Spark's `round` and DuckDB's `round` apply to doubles) as a
 * 64-bit integer, then the products are summed in Long arithmetic.
 *
 * Why quantize: float/double dot products are summation-order-dependent,
 * so argmax-by-similarity (cluster assignment) can flip between engines
 * on near-ties — unverifiable across engines. The quantized dot is a
 * single exact integer everywhere, making assignment + tie-break fully
 * deterministic and cross-engine comparable while preserving similarity
 * ordering to ~1e-4 relative precision (plenty for cluster routing).
 *
 * Overflow headroom: |round(x·1e4)| ≤ ~1e5 for any sane embedding value,
 * so each product ≤ 1e10 and a 4096-dim sum ≤ 4e13 « 2^63.
 *
 * One fused codegen loop (same shape as [[CosineSimilarity]]); NULL for
 * NULL inputs, mismatched lengths, or NULL elements.
 */
case class QuantizedDot(left: Expression, right: Expression, scale: Int)
  extends BinaryExpression {

  require(scale >= 1, "quantization scale must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float> arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "quantized_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += QuantizedDot.q(x.getFloat(i), scale) * QuantizedDot.q(y.getFloat(i), scale)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += graft.functions.QuantizedDot.q($x.getFloat($i), $scale)
         |          * graft.functions.QuantizedDot.q($y.getFloat($i), $scale);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedDot =
    copy(left = newLeft, right = newRight)
}

object QuantizedDot {
  /** `round(x*scale)` half away from zero, in double precision — the
    * exact arithmetic the DuckDB oracle's `round(cast(x as double)*s)`
    * performs. JVM-static for generated-code calls. */
  def q(x: Float, scale: Int): Long = {
    val v = x.toDouble * scale
    if (v >= 0) java.lang.Math.floor(v + 0.5).toLong
    else java.lang.Math.ceil(v - 0.5).toLong
  }
}
