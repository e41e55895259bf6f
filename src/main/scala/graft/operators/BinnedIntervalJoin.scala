package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-proof partitioned overlap join via genomic binning — the 100-TB
 * answer to hot equi-keys (a genome has ~25 chromosomes and chr1 alone is
 * ~8 % of it, so hash-clustering on the key caps parallelism at the key
 * count; reference data per SURVEY §4 "contig skew").
 *
 * Both sides explode each interval to every `binSize`-wide bin it spans
 * and the join clusters on `(keys..., bin)` — one hot key becomes
 * `range/binSize` independent partitions. A pair overlapping in several
 * shared bins would be emitted once per bin, so the join keeps only the
 * bin containing `max(leftStart, rightStart)` (the leftmost bin where both
 * intervals are present) — a per-pair predicate, no dedup shuffle.
 *
 * The exploded join is an ordinary Inner join with `(keys, bin)`
 * equi-keys + the overlap pair + a residual — exactly the shape
 * [[graft.plans.IntervalJoinStrategy]] claims, so it executes as a
 * partitioned `IntervalJoinExec` with per-(key, bin) indexes.
 */
object BinnedIntervalJoin {

  /** Overlap-join `left` and `right` with binned partitioning.
    *
    * @param keys    equal-named equi-key columns present on both sides
    *                (may be empty: pure range join, binning then provides
    *                the partitioning a keyless join otherwise lacks)
    * @param binSize genomic bin width (tune so a bin's build rows fit an
    *                executor; e.g. 1e6 for genome coordinates)
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      binSize: Int): DataFrame = {
    require(binSize > 0, "binSize must be positive")

    // least/greatest keeps the span set correct for inverted (start > end)
    // intervals, which the unbinned join matches via the raw predicate.
    // The span cap guards the explode: ONE open-ended sentinel row
    // (end = Long.MaxValue) would otherwise ask sequence() for ~1e13
    // elements and kill the whole job — same guard the planner-automatic
    // rewrite applies. Oversized spans fail with the offending width.
    val maxBinsPerRow = 1000000L
    def withBins(df: DataFrame, start: String, end: String, binCol: String) = {
      val bs = floor(col(start).cast("long") / binSize).cast("long")
      val be = floor(col(end).cast("long") / binSize).cast("long")
      val span = greatest(bs, be) - least(bs, be) + 1L
      // span >= 1 also catches Long overflow of the subtraction itself
      // (binSize=1 with coords spanning the full domain wraps negative)
      val guarded = when(span >= 1L && span <= maxBinsPerRow,
        sequence(least(bs, be), greatest(bs, be)))
        .otherwise(raise_error(concat(
          lit(s"[GRAFT_INTERVAL_JOIN] binned join: interval spans "),
          span, lit(s" bins of $binSize — raise binSize or filter " +
            "open-ended sentinel intervals"))))
      df.withColumn(binCol, explode(guarded))
    }

    val l = withBins(left, leftStart, leftEnd, "__bin_l")
    val r = withBins(right, rightStart, rightEnd, "__bin_r")

    val keyCond = keys.map(k => l(k) === r(k))
    val overlap = l(leftStart) <= r(rightEnd) && l(leftEnd) >= r(rightStart)
    // anti-duplication: count the pair only in the bin of the larger start
    val owner = floor(greatest(l(leftStart), r(rightStart)).cast("long") /
      binSize).cast("long") === l("__bin_l")
    val cond = (keyCond :+ (l("__bin_l") === r("__bin_r")) :+ overlap :+ owner)
      .reduce(_ && _)

    l.join(r, cond).drop("__bin_l", "__bin_r")
  }
}
