package graft

import graft.operators.TextStats
import org.apache.spark.sql.functions._

/** The ranked greedy BPE loop on hand-computed words — including the
  * MULTI-LEVEL path (a merge whose left side is itself a merged token)
  * that the q112 oracle's letter-disjoint counting can't express. */
class BpeTokenCountSpec extends SparkTestBase {

  private val merges = Seq("t" -> "h", "th" -> "e", "e" -> "r")

  private def counts(texts: (String, Long)*): Unit = {
    import spark.implicits._
    val df = texts.map(_._1).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = df.select(col("id"),
        TextStats.bpeTokenCount(col("text"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case ((t, want), i) =>
      assert(got(i.toLong) == want, s"'$t' expected $want got ${got(i.toLong)}")
    }
  }

  test("multi-level ranked merges apply in rank order, all occurrences") {
    counts(
      // t+h first (rank 0), THEN th+e (rank 1): the → 1 token
      "the" -> 1L,
      // there → the|r|e (e+r can no longer fire after th+e consumed the e)
      "there" -> 3L,
      // earth → e|a|r|th (no adjacent ranked pair remains)
      "earth" -> 4L,
      // ether → e|the|r — the mid-word multi-level merge
      "ether" -> 3L,
      // both occurrences of t+h merge in one pass
      "ththt" -> 3L,
      // rank 2 fires where rank 0/1 cannot: er → 1 token
      "er" -> 1L,
      // whitespace split + lowercase normalization: The tether → 1 + 4
      "The tether" -> 5L,
      // no ranked pair at all
      "hat" -> 3L,
      "" -> 0L)
  }

  test("NULL text yields NULL, and codegen matches interpreted") {
    import spark.implicits._
    val df = Seq((1L, "there"), (2L, null)).toDF("id", "text")
    val rows = df.select(col("id"),
        TextStats.bpeTokenCount(col("text"), merges).as("n"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(rows.sortBy(_._1).toSeq == Seq((1L, 3L), (2L, -1L)))
  }
}
