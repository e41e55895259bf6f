package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
  extends UnaryExpression {

  require(n >= 1, "gram size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "positional_gram_hashes"

  override def nullSafeEval(input: Any): Any =
    WordHashing.positionalGramHashes(input.asInstanceOf[UTF8String], n)

  /** Real codegen (was `CodegenFallback` through round 10), mirroring
    * [[ShingleHashes.doGenCode]]: one static invoke of the shared
    * kernel, inlined into the enclosing whole-stage-codegen span. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordHashing.positionalGramHashes($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): PositionalGramHashes = copy(child = newChild)
}
