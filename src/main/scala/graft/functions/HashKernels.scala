package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared bits for kernels over `array<long>` shingle hashes. */
trait LongArrayKernel extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.simpleString}")
  }
}

object HashKernels {
  /** splitmix64 finalizer — a strong, branchless 64-bit mixer (public
    * domain constant set; Steele et al., "Fast splittable pseudorandom
    * number generators"). */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic per-function salts (fixed seed → identical on every
    * executor and run). */
  def salts(numHashes: Int): Array[Long] = {
    val rnd = new java.util.SplittableRandom(0x67726166744c5348L) // "graftLSH"
    Array.fill(numHashes)(rnd.nextLong())
  }
}

/**
 * MinHash signature kernel: `sig[i] = min over shingle hashes h of
 * mix64(h + salt_i)` — one compiled double loop, no per-element lambda
 * interpretation or intermediate arrays (the declarative
 * aggregate/zip_with formulation allocates a 64-wide array per shingle).
 */
case class MinHashSignature(child: Expression, numHashes: Int)
  extends LongArrayKernel with CodegenFallback {

  require(numHashes >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  @transient private lazy val salts = HashKernels.salts(numHashes)

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val out = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < numHashes) {
        val v = HashKernels.mix64(h + salts(i))
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/**
 * Sign-random-projection bucket kernel over an `array<float>` embedding:
 * bit p of the result = sign of `Σ_d (±1)·vec[d]`, with the ±1 plane
 * components derived from mix64(p·dim + d) parity — deterministic, no
 * stored model, one compiled double loop (the declarative nested-lambda
 * form interprets planes × dims element evaluations per row).
 */
case class SrpBucket(child: Expression, planes: Int, dim: Int)
  extends UnaryExpression with CodegenFallback {

  require(planes >= 1 && planes <= 63)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "srp_bucket"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var s = 0.0
      var d = 0
      while (d < n) {
        val x = v.getFloat(d).toDouble
        if ((HashKernels.mix64(p.toLong * dim + d) & 1L) != 0L) s += x
        else s -= x
        d += 1
      }
      if (s > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBucket =
    copy(child = newChild)
}

/**
 * SimHash kernel: 64-bit per-bit majority vote over shingle hashes,
 * folded into one BIGINT — one compiled loop (the declarative form
 * interprets 64 lambda evaluations per shingle).
 */
case class SimHash64(child: Expression)
  extends LongArrayKernel with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) != 0L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
