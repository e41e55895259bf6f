package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/**
 * IVF cell assignment: argmax over trained (unit-norm) centroids of
 * dot(vector, centroid) — the inverted-file partitioner behind
 * [[graft.operators.Similarity.ivfBucketize]]. One compiled loop over a
 * flat centroid array; the vector's own norm is constant across centroids,
 * so max dot ≡ max cosine. Ties break to the lower centroid id, so
 * assignment is deterministic.
 *
 * Centroids are held as `Seq[Seq[Float]]` (not arrays): case-class
 * equality must be structural for Catalyst canonicalization /
 * common-subexpression elimination to recognize identical expressions.
 */
case class IvfBucket(child: Expression, centroids: Seq[Seq[Float]])
  extends UnaryExpression {

  require(centroids.nonEmpty)
  require(centroids.forall(_.length == centroids.head.length),
    "ivf_bucket: ragged centroids — all rows must share one dimension")

  @transient private lazy val k = centroids.length
  @transient private lazy val dim = centroids.head.length
  @transient private lazy val flat: Array[Float] = {
    val f = new Array[Float](k * dim)
    var c = 0
    while (c < k) {
      val row = centroids(c)
      var d = 0
      while (d < dim) { f(c * dim + d) = row(d); d += 1 }
      c += 1
    }
    f
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_bucket"

  override def nullSafeEval(input: Any): Any =
    IvfBucket.assign(input.asInstanceOf[ArrayData], flat, k, dim)

  /** Real codegen (CodegenFallback through round 11's start): one static
    * invoke of the shared kernel, the flat centroid matrix pinned as a
    * reference object. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("ivfCentroids", flat, "float[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.IvfBucket.assign($c, $flatRef, $k, $dim)")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfBucket =
    copy(child = newChild)
}

object IvfBucket {
  /** Kernel body — JVM-static so generated code calls it directly. */
  def assign(v: ArrayData, flat: Array[Float], k: Int, dim: Int): Int = {
    // a shorter vector would silently truncate the dot product, breaking
    // the max-dot = max-cosine invariant (centroids are unit-norm over
    // the FULL dim, their first-n sub-norms differ per centroid) — fail
    // with the actual dims instead of mis-assigning cells
    if (v.numElements() != dim) {
      throw new IllegalArgumentException(
        s"ivf_bucket: vector dim ${v.numElements()} != centroid dim $dim")
    }
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      var s = 0.0
      val off = c * dim
      var d = 0
      while (d < dim) {
        s += v.getFloat(d).toDouble * flat(off + d)
        d += 1
      }
      if (s > bestDot) { bestDot = s; best = c }
      c += 1
    }
    best
  }
}
