package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/**
 * Codegen'd Bloom-filter membership probe over a 64-bit hash column.
 *
 * The bitset rides the expression as a plain `Array[Long]` reference
 * object: the closure-serialized task ships it once per executor (like
 * any literal), `doGenCode` pins it into the generated class via
 * `addReferenceObj`, and the per-row cost is `numHashes` masked reads —
 * no boxing, no virtual dispatch, stays inside whole-stage codegen.
 *
 * Double hashing (Kirsch–Mitzenmacher, "Less Hashing, Same
 * Performance", ESA 2006): position_i = h1 + i*h2 mod m, with h2 forced
 * odd so the probe sequence never degenerates. The input is already a
 * 64-bit hash (xxhash64 / shingle hash), so no re-hash is needed.
 *
 * Bloom filters have NO false negatives — a `false` here is definitive,
 * which is what makes the filter sound as a pre-join pruner: survivors
 * (true bits, including ~fpp false positives) continue to an exact
 * verify join; everything pruned is provably absent from the build set.
 */
case class BloomContains(child: Expression, bits: Array[Long], numHashes: Int)
  extends UnaryExpression {

  require(bits.nonEmpty && numHashes >= 1,
    "bloom filter needs a non-empty bitset and >= 1 hash functions")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a bigint hash argument, got ${other.simpleString}")
  }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_contains"

  override def nullSafeEval(input: Any): Any =
    BloomKernel.mightContain(bits, numHashes, input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BloomKernel.mightContain($bitsRef, $numHashes, $c)")
  }

  // the bitset is identity-compared by case-class equals; semantic
  // equality by content keeps plan canonicalization (e.g. reused
  // exchange detection) working when the same filter appears twice
  override def equals(other: Any): Boolean = other match {
    case BloomContains(c, b, k) =>
      c == child && k == numHashes && java.util.Arrays.equals(b, bits)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + java.util.Arrays.hashCode(bits)) + numHashes

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
}

/** Shared eval/codegen kernel + builder. JVM static calls from generated
  * code (mirrors [[WordHashing]]'s pattern). */
object BloomKernel {

  /** `true` if `hash` may be in the set; `false` = definitely absent. */
  def mightContain(bits: Array[Long], numHashes: Int, hash: Long): Boolean = {
    val m = bits.length.toLong << 6 // bits
    val h1 = hash
    val h2 = (hash >>> 32) | 1L // odd step => full-period probe sequence
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Math.floorMod(h1 + i * h2, m)
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Set the probe positions of `hash` in `bits` (build side). */
  def add(bits: Array[Long], numHashes: Int, hash: Long): Unit = {
    val m = bits.length.toLong << 6
    val h1 = hash
    val h2 = (hash >>> 32) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Math.floorMod(h1 + i * h2, m)
      bits((pos >>> 6).toInt) |= 1L << (pos & 63)
      i += 1
    }
  }

  /** Bitset words for `n` keys at `bitsPerKey` (min one word). */
  def sizeWords(n: Long, bitsPerKey: Int): Int = {
    val bits = math.max(64L, n * bitsPerKey)
    // cap at 2^31 bits (256 MiB) — beyond that the broadcast itself is
    // the problem and the caller should shard or raise bitsPerKey down
    val capped = math.min(bits, Int.MaxValue.toLong)
    ((capped + 63) >>> 6).toInt
  }
}
