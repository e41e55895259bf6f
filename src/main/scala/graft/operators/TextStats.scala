package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data pipelines: token counting,
 * quality scoring, n-gram language identification, and document
 * fingerprinting. All built-in codegen'd expressions — no UDFs — so the
 * whole stage stays inside WholeStageCodegen and scales linearly with
 * input splits (pure map-side work, zero shuffle).
 */
object TextStats {

  /** Whitespace token count (empty/blank text → 0). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** Rough BPE-ish subword count: word-boundary pieces plus intra-word
    * 4-char chunks (a cheap proxy for tokenizer budget accounting). */
  def subwordCount(text: Column): Column =
    aggregate(split(trim(text), "\\s+"), lit(0),
      (acc, w) => acc + greatest(ceil(length(w) / 4.0).cast("int"), lit(1)))

  /** Ratio of characters matching `pattern` (a regex character class). */
  private def charClassRatio(text: Column, pattern: String): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      round((length(text) - length(regexp_replace(text, pattern, "")))
        .cast("double") / length(text).cast("double"), 6))

  def punctRatio(text: Column): Column =
    charClassRatio(text, "[\\.,;:!\\?'\"()\\[\\]{}-]")

  def digitRatio(text: Column): Column = charClassRatio(text, "[0-9]")

  def upperRatio(text: Column): Column = charClassRatio(text, "[A-Z]")

  def whitespaceRatio(text: Column): Column = charClassRatio(text, "\\s")

  // public so the DuckDB oracle SQL can embed the exact same lists
  val enStopList: Seq[String] = Seq("the", "a", "an", "and", "of", "to",
    "in", "is", "that", "it", "for", "on", "with", "as", "was", "at", "by",
    "be")
  val deStopList: Seq[String] = Seq("der", "die", "das", "und", "ist",
    "von", "zu", "den", "mit", "nicht", "ein", "eine", "auf", "fuer")
  val frStopList: Seq[String] = Seq("le", "la", "les", "de", "des", "et",
    "est", "un", "une", "du", "que", "pour", "dans", "pas")
  val esStopList: Seq[String] = Seq("el", "la", "los", "las", "de", "y",
    "es", "un", "una", "del", "que", "por", "en", "no")
  private def enStop = enStopList
  private def deStop = deStopList
  private def frStop = frStopList
  private def esStop = esStopList

  private def stopHits(ws: Column, stops: Seq[String]): Column =
    size(filter(ws, w => w.isInCollection(stops)))

  /** Fraction of tokens that are (English) stopwords — a classic quality
    * signal: near-zero for word soup / non-prose. */
  def stopwordRatio(text: Column): Column = {
    val ws = Dedup.words(text)
    when(size(ws) === 0, lit(0.0))
      .otherwise(round(stopHits(ws, enStop).cast("double") /
        size(ws).cast("double"), 6))
  }

  /** Stopword-profile language ID over {en, de, fr, es}; `und`
    * (undetermined) when nothing matches. Deterministic argmax with
    * lexicographic tie-break. */
  def langId(text: Column): Column = {
    val ws = Dedup.words(text)
    val scored = array(
      struct(stopHits(ws, deStop).as("hits"), lit("de").as("lang")),
      struct(stopHits(ws, enStop).as("hits"), lit("en").as("lang")),
      struct(stopHits(ws, esStop).as("hits"), lit("es").as("lang")),
      struct(stopHits(ws, frStop).as("hits"), lit("fr").as("lang")))
    val best = array_max(scored)
    when(best.getField("hits") <= 0, lit("und"))
      .otherwise(best.getField("lang"))
  }

  /** Composite [0,1] quality score from length, stopword and symbol
    * signals (inspired by public web-corpus quality heuristics: prose has
    * moderate length, some stopwords, low symbol noise). */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenScore = least(nTok / 64.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    val noise = punctRatio(text) + digitRatio(text)
    val noiseScore = greatest(lit(1.0) - noise * 4.0, lit(0.0))
    round((lenScore + stopScore + noiseScore) / 3.0, 6)
  }

  /** Winnowing-style document fingerprint: min over all `k`-shingles of a
    * 64-bit hash — equal for documents with an identical shingle somewhere
    * minimized, robust to reordering. One BIGINT per doc. */
  def fingerprint(text: Column, k: Int = 5): Column =
    array_min(transform(Dedup.wordShingles(text, k), s => xxhash64(s)))

  /** Convenience: append the full stats column set. */
  def withStats(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("n_subwords", subwordCount(col(textCol)))
      .withColumn("punct_ratio", punctRatio(col(textCol)))
      .withColumn("digit_ratio", digitRatio(col(textCol)))
      .withColumn("stopword_ratio", stopwordRatio(col(textCol)))
      .withColumn("lang_pred", langId(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("fingerprint", fingerprint(col(textCol)))
}
