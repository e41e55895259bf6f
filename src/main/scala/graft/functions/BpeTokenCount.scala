package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Token count of `text` under a trained BPE merge list — the REAL
 * greedy algorithm every GPT-style tokenizer runs (Sennrich et al.
 * 2016, arXiv:1508.07909): per whitespace word, start from characters
 * and repeatedly merge the adjacent pair with the LOWEST merge rank
 * until no ranked pair remains. This is the "how many tokens is my
 * corpus" primitive an LLM-training pipeline runs over every document
 * (token budgeting, cost estimation, packing) — q98's pair statistics
 * are one TRAINING round of the same scheme; this expression APPLIES a
 * trained table.
 *
 * Pure map-side; the merge table rides along as a reference object
 * (broadcast-equivalent: serialized once per task, not per row).
 * Codegen calls the static helper directly on the UTF8String — no
 * boxing, no virtual dispatch (the [[QuantizedDot]] pattern).
 *
 * NULL text → NULL. Normalization matches the corpus convention used
 * everywhere else (`Dedup.words`): lowercase, split on `\s+`.
 */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  require(merges.nonEmpty, "BPE merge list must not be empty")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string argument, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_token_count"

  @transient private lazy val table: BpeTokenCount.MergeTable =
    BpeTokenCount.MergeTable(merges.toArray)

  override def nullSafeEval(input: Any): Any =
    BpeTokenCount.count(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeTokenCount.MergeTable].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeTokenCount.count($c, $tableRef)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeTokenCount = copy(child = newChild)
}

object BpeTokenCount {

  /** Rank lookup keyed by "left right" (pair strings can be
    * multi-char after earlier merges). */
  case class MergeTable(pairs: Array[(String, String)])
    extends Serializable {
    @transient lazy val rank: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer]()
      pairs.zipWithIndex.foreach { case ((a, b), i) =>
        m.put(a + " " + b, i)
      }
      m
    }
  }

  /** The greedy BPE loop over one word's token list: find the
    * lowest-rank adjacent pair, merge ALL its (left-to-right,
    * non-overlapping) occurrences, repeat. Returns the token count. */
  private def wordTokens(word: String, t: MergeTable): Int = {
    if (word.isEmpty) return 0
    var toks = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      // surrogate-pair-safe character split
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      toks.add(word.substring(i, i + n))
      i += n
    }
    var done = false
    while (!done && toks.size > 1) {
      var best = Integer.MAX_VALUE
      var j = 0
      while (j < toks.size - 1) {
        val r = t.rank.get(toks.get(j) + " " + toks.get(j + 1))
        if (r != null && r < best) best = r
        j += 1
      }
      if (best == Integer.MAX_VALUE) done = true
      else {
        val (a, b) = t.pairs(best)
        val merged = new java.util.ArrayList[String](toks.size)
        var k = 0
        while (k < toks.size) {
          if (k < toks.size - 1 && toks.get(k) == a && toks.get(k + 1) == b) {
            merged.add(a + b); k += 2
          } else { merged.add(toks.get(k)); k += 1 }
        }
        toks = merged
      }
    }
    toks.size
  }

  /** Regex-`\s` whitespace (the `Dedup.words` / RE2 set, NOT the wider
    * `Character.isWhitespace`) so tokenization matches the corpus
    * convention and the oracle's `\s` exactly. */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
      c == '\f' || c == '\r'

  /** Whitespace-split + lowercase, then the per-word greedy loop. */
  def count(text: UTF8String, t: MergeTable): Long = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    var total = 0L
    var i = 0
    while (i < s.length) {
      while (i < s.length && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < s.length && !isWs(s.charAt(i))) i += 1
      if (i > start) total += wordTokens(s.substring(start, i), t)
    }
    total
  }
}
