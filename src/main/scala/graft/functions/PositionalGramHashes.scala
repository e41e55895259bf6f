package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Positional twin of [[ShingleHashes]]: one compiled pass that
 * lower-cases, tokenizes on ASCII whitespace, slides an `n`-word
 * window, and emits the 64-bit gram hashes **in document order** —
 * element `i` is the hash of the gram starting at token position `i`
 * (the input to `posexplode` in span-level substring dedup, where
 * POSITIONS are the point). No sort, no dedup: a gram repeated at two
 * positions appears twice, at its positions. Documents shorter than
 * `n` tokens (and empty text) yield an empty array — a short document
 * contains no full gram, unlike [[ShingleHashes]]'s whole-document
 * fallback shingle, which exists for set-similarity semantics.
 *
 * Tokenization and the two-lane murmur window hash are shared with
 * [[ShingleHashes]] so both kernels agree with the declarative
 * `split("\\s+")` twin the oracles replicate.
 */
case class PositionalGramHashes(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, "gram size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "positional_gram_hashes"

  override def nullSafeEval(input: Any): Any = {
    val wArr = WordHashing.tokenize(input.asInstanceOf[UTF8String])
    if (wArr.length < n) return new GenericArrayData(Array.empty[Long])
    val m = wArr.length - n + 1
    val hs = new Array[Long](m)
    var j = 0
    while (j < m) { hs(j) = WordHashing.hashWindow(wArr, j, n); j += 1 }
    new GenericArrayData(hs)
  }

  override protected def withNewChildInternal(
      newChild: Expression): PositionalGramHashes = copy(child = newChild)
}
