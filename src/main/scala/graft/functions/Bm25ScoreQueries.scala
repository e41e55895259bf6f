package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Per-document BM25 query-score fan-out in one compiled pass — the
 * scoring kernel of [[graft.operators.TextStats.bm25Retrieve]].
 *
 * Input: one row per document, `array<struct<s: bigint, tid: int>>` —
 * the document's matched query-vocabulary terms, each carrying its
 * quantized per-term score `s` (integer micro-units, the q131/q142
 * discipline; computed by the UNCHANGED declarative score expression,
 * so the values are bit-identical to the previous aggregate shape) and
 * the term's dense id into `qidsByTid`, the term → query-ids inverted
 * table that rides the expression as a reference object (the
 * [[BloomContains]] bitset pattern — pinned into the generated class
 * via `addReferenceObj`, shipped once per task binary; its total size
 * is |query, term| pairs, the SAME broadcast ceiling the query side
 * already had). Output: `array<struct<query_id: bigint, score_q:
 * bigint>>`, one entry per query sharing ≥ 1 term with the document,
 * `score_q = Σ_{t ∈ query ∩ doc} s(t)` — exact integer addition, so
 * bit-identical on any engine or partitioning — sorted by `query_id`.
 *
 * Why an Expression and not `groupBy(query_id, doc_id).sum`: the
 * per-(query, doc) collapse of the Σ_term df·qf fan-out is a
 * high-cardinality hash aggregate — BENCH_CLEAN_r15's most expensive
 * clean entry, profiled r16: the 14.6 M-row → 4.9 M-group aggregate
 * alone cost ~7-9 s of bm25_retrieve_1k's 16.1 s on a RESIDENT
 * fan-out, insensitive to fastHashMap capacity (2-level map on/off =
 * 7 s/14 s; capacityBit 16/20/24 = 7.5/7.9/22 s). Here the same sums
 * run as primitive `LongMap` increments amortized over a whole
 * document per call — per-DOCUMENT dispatch, not per-output-row (the
 * q144 HOF lesson: a higher-order-function formulation of this kernel
 * measured 4× slower than even the aggregate, one interpreted lambda
 * per element) — and the fan-out rows never cross an exchange: only
 * the ≤ |doc| × |matched terms| 16-byte entries do.
 *
 * CALLER CONTRACT: no null entries; every `tid` indexes `qidsByTid`
 * (both sides derive from the same driver-built vocabulary).
 */
case class Bm25ScoreQueries(child: Expression, qidsByTid: Array[Array[Long]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(a, b)), _)
        if a.dataType == LongType && b.dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<struct<bigint, int>>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("score_q", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "bm25_score_queries"

  override def nullSafeEval(input: Any): Any =
    Bm25ScoreQueries.score(input.asInstanceOf[ArrayData], qidsByTid)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("qidsByTid", qidsByTid, "long[][]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.Bm25ScoreQueries.score($a, $tableRef)")
  }

  // reference-table content equality (not identity) keeps plan
  // canonicalization working when the same retrieval appears twice
  override def equals(other: Any): Boolean = other match {
    case Bm25ScoreQueries(c, t) =>
      c == child && java.util.Arrays.deepEquals(
        t.asInstanceOf[Array[AnyRef]], qidsByTid.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.deepHashCode(qidsByTid.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildInternal(
      newChild: Expression): Bm25ScoreQueries = copy(child = newChild)
}

object Bm25ScoreQueries {
  /** Accumulate per-query sums over one document's matched terms
    * (static so the generated code calls it without an instance). */
  def score(entries: ArrayData, qidsByTid: Array[Array[Long]]): ArrayData = {
    val n = entries.numElements()
    val acc = new mutable.LongMap[Long](math.max(16, n * 2))
    var i = 0
    while (i < n) {
      val e = entries.getStruct(i, 2)
      val s = e.getLong(0)
      val qids = qidsByTid(e.getInt(1))
      var j = 0
      while (j < qids.length) {
        val q = qids(j)
        acc.update(q, acc.getOrElse(q, 0L) + s)
        j += 1
      }
      i += 1
    }
    val ks = acc.keys.toArray
    java.util.Arrays.sort(ks)
    val out = new Array[Any](ks.length)
    var m = 0
    while (m < ks.length) {
      out(m) = InternalRow(ks(m), acc(ks(m)))
      m += 1
    }
    new GenericArrayData(out)
  }
}
