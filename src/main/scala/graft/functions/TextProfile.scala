package graft.functions

import graft.operators.TextStats

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * One-pass text profile: character-class counts, token counts, per-language
 * stopword hits and the language-ID verdict, in a single compiled scan.
 *
 * Semantics replicate the declarative [[TextStats]] formulas exactly (the
 * DuckDB oracles depend on it): punctuation class `[.,;:!?'"()\[\]{}-]`,
 * digits `[0-9]`, uppercase `[A-Z]`, whitespace tokenization of the
 * trimmed text, stopword matching on lower-cased tokens, subwords =
 * `max(ceil(len/4), 1)` per token, and the langid argmax with
 * ties-toward-later-language (fr > es > en > de) and `und` on zero hits.
 */
case class TextProfile(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = TextProfile.schema

  override def prettyName: String = "text_profile"

  override def nullSafeEval(input: Any): Any =
    TextProfile.profile(input.asInstanceOf[UTF8String])

  /** Real codegen (CodegenFallback through round 11's start — boxed
    * `eval` dispatch per row on every text-stats/langid/curation scan):
    * one static invoke of the shared kernel. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextProfile.profile($c)")

  override protected def withNewChildInternal(newChild: Expression): TextProfile =
    copy(child = newChild)
}

object TextProfile {

  /** Kernel body — JVM-static so generated code calls it directly. */
  def profile(input: UTF8String): InternalRow = {
    val s = input.toString
    var punct = 0; var digit = 0; var upper = 0; var ws = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (TextProfile.punctSet(c)) punct += 1
      if (c >= '0' && c <= '9') digit += 1
      if (c >= 'A' && c <= 'Z') upper += 1
      if (TextProfile.isAsciiWs(c)) ws += 1
      i += 1
    }
    // tokenize the lower-cased text. Locale.ROOT: default-locale casing
    // diverges from Spark's locale-independent lower() (e.g. Turkish
    // dotless i), which would break the oracle contract per-cluster-locale
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    var nTokens = 0; var nSubwords = 0
    var en = 0; var de = 0; var es = 0; var fr = 0
    i = 0
    while (i < lower.length) {
      while (i < lower.length && TextProfile.isAsciiWs(lower.charAt(i))) i += 1
      val start = i
      while (i < lower.length && !TextProfile.isAsciiWs(lower.charAt(i))) i += 1
      if (i > start) {
        nTokens += 1
        // token length in codepoints, matching DuckDB/Spark length()
        val len = lower.codePointCount(start, i)
        nSubwords += math.max((len + 3) / 4, 1)
        val w = lower.substring(start, i)
        if (TextProfile.enSet(w)) en += 1
        if (TextProfile.deSet(w)) de += 1
        if (TextProfile.esSet(w)) es += 1
        if (TextProfile.frSet(w)) fr += 1
      }
    }
    val lang =
      if (math.max(math.max(de, en), math.max(es, fr)) <= 0) "und"
      else if (fr >= de && fr >= en && fr >= es) "fr"
      else if (es >= de && es >= en) "es"
      else if (en >= de) "en"
      else "de"
    // n_chars counts CODEPOINTS (= DuckDB length(), Spark length()), not
    // UTF-16 units — keeps ratios oracle-exact for non-BMP text (emoji).
    // The class counters above are unaffected: punct/digit/upper/whitespace
    // are all BMP classes and surrogate halves match none of them.
    InternalRow(s.codePointCount(0, s.length), nTokens, nSubwords,
      punct, digit, upper, ws, en, de, es, fr, UTF8String.fromString(lang))
  }

  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_subwords", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_digit", IntegerType, nullable = false),
    StructField("n_upper", IntegerType, nullable = false),
    StructField("n_ws", IntegerType, nullable = false),
    StructField("sw_en", IntegerType, nullable = false),
    StructField("sw_de", IntegerType, nullable = false),
    StructField("sw_es", IntegerType, nullable = false),
    StructField("sw_fr", IntegerType, nullable = false),
    StructField("lang_pred", StringType, nullable = false)))

  // mirrors TextStats.punctRatio's regex class [.,;:!?'"()\[\]{}-]
  private val punctSet: Set[Char] = ".,;:!?'\"()[]{}-".toSet

  /** The regex `\s` class (ASCII) — Character.isWhitespace would also
    * match U+3000 etc. and diverge from the declarative `split(\s+)`
    * twin and the DuckDB oracles. */
  private[functions] def isAsciiWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  private val enSet = TextStats.enStopList.toSet
  private val deSet = TextStats.deStopList.toSet
  private val esSet = TextStats.esStopList.toSet
  private val frSet = TextStats.frStopList.toSet
}
