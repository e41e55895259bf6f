package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Interval set operations (bedtools `merge` / `genomecov`-style; beyond
 * the reference, which ships only the join): union overlapping intervals
 * per key and derive coverage statistics.
 *
 * Algorithm: the classic sweep expressed as window functions — sort by
 * (start, end) within each key, compute the running max end over the
 * PRECEDING frame, flag rows whose start exceeds it (plus `maxGap`) as
 * group starts, prefix-sum the flags into group ids, aggregate.
 *
 * Scale: one shuffle clustering on the keys, then an in-task sort per
 * key — O(n log n) with external-sort spilling, so a hot key degrades
 * gracefully instead of blowing memory (unlike a quadratic self-join).
 * No driver-side collection anywhere.
 */
object IntervalOps {

  /** The shared sweep: every input row plus `__graft_gid`, the per-key
    * 1-based ordinal (in start order) of the maximal covered run the row
    * belongs to. One window pass — overlap clustering needs NO iteration
    * because coverage is contiguous along the sorted sweep. */
  private def withRunIds(df: DataFrame, keyCols: Seq[String],
      startCol: String, endCol: String, maxGap: Long): DataFrame = {
    require(maxGap >= 0, s"maxGap must be >= 0, got $maxGap")
    val keys: Seq[Column] = keyCols.map(col)
    val w = Window.partitionBy(keys: _*)
      .orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    // `prevMax + maxGap + 1` must not be computed when it would overflow
    // (a region ending near Long.MaxValue — open-ended sentinel): in that
    // regime no start can exceed the threshold anyway, so it is not a new
    // group. The guard short-circuits before the addition (ANSI-safe).
    val lim = lit(Long.MaxValue - maxGap - 1L)
    val flagged = df.withColumn("__graft_new_grp",
      when(prevMax.isNull ||
          (prevMax <= lim && col(startCol) > prevMax + maxGap + 1L), 1L)
        .otherwise(0L))
    flagged.withColumn("__graft_gid",
      sum(col("__graft_new_grp"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__graft_new_grp")
  }

  /** Merge overlapping or gap-free-adjacent intervals per key; `maxGap`
    * additionally bridges runs separated by at most that many UNCOVERED
    * coordinates. Output: key columns + `merged_start`, `merged_end`,
    * `n_merged`. End-inclusive: [1,5] and [6,9] merge at the default
    * `maxGap = 0` (no coordinate between them is uncovered — one maximal
    * covered run, same as bedtools merge's bookended behavior); [1,5]
    * and [7,9] need `maxGap >= 1` (coordinate 6 uncovered). */
  def mergeIntervals(df: DataFrame, keyCols: Seq[String], startCol: String,
      endCol: String, maxGap: Long = 0L): DataFrame = {
    val keys: Seq[Column] = keyCols.map(col)
    withRunIds(df, keyCols, startCol, endCol, maxGap)
      .groupBy(keys :+ col("__graft_gid"): _*)
      .agg(min(col(startCol)).as("merged_start"),
        max(col(endCol)).as("merged_end"),
        count(lit(1)).as("n_merged"))
      .drop("__graft_gid")
  }

  /** Interval clustering (bedtools cluster): every input row plus
    * `cluster_id` — the per-key 1-based ordinal of the maximal covered
    * run it belongs to ([[mergeIntervals]] semantics incl. `maxGap`).
    * Transitively-overlapping intervals share a cluster even when they
    * do not overlap pairwise; unlike duplicate-group connected
    * components this needs no iteration, because interval overlap is
    * contiguous along the per-key sorted sweep — one window pass. */
  def clusterIntervals(df: DataFrame, keyCols: Seq[String],
      startCol: String, endCol: String, maxGap: Long = 0L): DataFrame =
    withRunIds(df, keyCols, startCol, endCol, maxGap)
      .withColumnRenamed("__graft_gid", "cluster_id")

  /** Interval-set similarity (bedtools jaccard), per key: base-level
    * `intersection / union` between two interval sets. Each side is
    * merged first (disjoint maximal runs), the intersection comes from
    * the indexed interval join of the merged sets (each overlapping run
    * pair contributes `min(ends) − max(starts) + 1` bases, exact because
    * runs are disjoint within a side), and
    * `union = covered(a) + covered(b) − intersection`. Keys present in
    * only one side report jaccard 0. Output: key columns +
    * `intersection_bases`, `union_bases`, `jaccard`.
    *
    * Scale: two windowed sweeps + one indexed join on merged (small)
    * sets + broadcast-sized per-key aggregates — never touches raw pair
    * counts. */
  def intervalSetJaccard(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      startCol: String, endCol: String): DataFrame = {
    val keys: Seq[Column] = keyCols.map(col)
    // each side is merged ONCE; the covered-bases aggregates reuse the
    // same merged frame the intersection join consumes (one sweep per
    // side, not two)
    def covered(merged: DataFrame, out: String): DataFrame =
      merged.groupBy(keys: _*)
        .agg(sum(col("merged_end").cast("long") -
          col("merged_start").cast("long") + 1L).as(out))
    val ma = mergeIntervals(a, keyCols, startCol, endCol)
    val mbFull = mergeIntervals(b, keyCols, startCol, endCol)
    val mb0 = mbFull
      .select(keyCols.map(col) ++ Seq(
        col("merged_start").as("__graft_bs"),
        col("merged_end").as("__graft_be")): _*)
    val mb = keyCols.foldLeft(mb0)((df, k) =>
      df.withColumnRenamed(k, s"__graft_bk_$k"))
    val keyCond = keyCols.map(k => ma(k) === mb(s"__graft_bk_$k"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val cond = keyCond &&
      ma("merged_start") <= mb("__graft_be") &&
      ma("merged_end") >= mb("__graft_bs")
    val inter = ma.join(mb, cond)
      .groupBy(keys: _*)
      .agg(sum(least(col("merged_end"), col("__graft_be")).cast("long") -
        greatest(col("merged_start"), col("__graft_bs")).cast("long") + 1L)
        .as("__graft_ib"))
    covered(ma, "__graft_ca")
      .join(covered(mbFull, "__graft_cb"), keyCols, "full_outer")
      .join(inter, keyCols, "left_outer")
      .select(keys ++ {
        val ib = coalesce(col("__graft_ib"), lit(0L))
        val un = coalesce(col("__graft_ca"), lit(0L)) +
          coalesce(col("__graft_cb"), lit(0L)) - ib
        Seq(ib.as("intersection_bases"), un.as("union_bases"),
          round(ib.cast("double") / un.cast("double"), 6).as("jaccard"))
      }: _*)
  }

  /** Per-key depth histogram (bedtools genomecov-style): for every
    * coverage depth >= 1, the total number of coordinates covered by
    * exactly that many intervals. Classic +1/−1 boundary sweep as
    * relational ops: explode each interval into (start, +1) and
    * (end+1, −1) events, pre-aggregate deltas per coordinate, running-sum
    * per key in coordinate order, measure the span to the next event.
    * Two shuffles ((keys, pos) pre-aggregation, then keys-clustered
    * window); the per-key sort spills externally, so hot keys degrade
    * gracefully. Output: key columns + `depth`, `bases`. */
  def depthHistogram(df: DataFrame, keyCols: Seq[String], startCol: String,
      endCol: String): DataFrame = {
    val keys: Seq[Column] = keyCols.map(col)
    // ONE scan: explode each interval into its (start, +1) / (end+1, −1)
    // events (a self-union would recompute the upstream plan twice). An
    // end at Long.MaxValue (open-ended sentinel) has no representable
    // close position — its close event is dropped, which is exact: the
    // interval then covers every later finite segment, and the unbounded
    // tail after the last event is out of range for any sweep anyway.
    val aS = col(startCol).cast("long")
    val aE = col(endCol).cast("long")
    val events = df.select(keys :+ explode(filter(array(
        struct(aS.as("__graft_pos"), lit(1L).as("__graft_delta")),
        struct(when(aE =!= Long.MaxValue, aE + 1L).as("__graft_pos"),
          lit(-1L).as("__graft_delta"))),
      ev => ev("__graft_pos").isNotNull)).as("__graft_ev"): _*)
    val agg = events
      .select(keys ++ Seq(col("__graft_ev.__graft_pos").as("__graft_pos"),
        col("__graft_ev.__graft_delta").as("__graft_delta")): _*)
      .groupBy(keys :+ col("__graft_pos"): _*)
      .agg(sum(col("__graft_delta")).as("__graft_d"))
    val w = Window.partitionBy(keys: _*).orderBy(col("__graft_pos"))
    val sweep = agg.select(keys ++ Seq(
      col("__graft_pos"),
      sum(col("__graft_d")).over(w).as("depth"),
      lead(col("__graft_pos"), 1).over(w).as("__graft_next")): _*)
    sweep
      .where(col("__graft_next").isNotNull && col("depth") > 0)
      .groupBy(keys :+ col("depth"): _*)
      .agg(sum(col("__graft_next") - col("__graft_pos")).as("bases"))
  }

  /** Interval subtraction (bedtools subtract): for every `a` interval,
    * the maximal sub-ranges NOT covered by any same-key `b` interval —
    * one output row per fragment, all original `a` columns preserved
    * plus `frag_start` / `frag_end` (Long). Both inputs use the same
    * key/bound column names.
    *
    * Plan shape: `b` is merged (windowed sweep), then a LEFT OUTER
    * interval join `a` × merged-b — which the planner claims as the
    * custom IntervalJoinExec — and per-`a`-row gap extraction via
    * lag/lead windows over the (disjoint, sorted) overlapping regions.
    * No per-coordinate explosion anywhere. */
  def subtractIntervals(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      startCol: String, endCol: String): DataFrame = {
    val mb0 = mergeIntervals(b, keyCols, startCol, endCol)
      .select(keyCols.map(col) ++ Seq(
        col("merged_start").cast("long").as("__graft_ms"),
        col("merged_end").cast("long").as("__graft_me")): _*)
    val mb = keyCols.foldLeft(mb0)((df, k) =>
      df.withColumnRenamed(k, s"__graft_bk_$k"))
    val aa = a.withColumn("__graft_aid", monotonically_increasing_id())
    val keyCond = keyCols.map(k => aa(k) === mb(s"__graft_bk_$k"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val cond = keyCond &&
      mb("__graft_ms") <= aa(endCol) && mb("__graft_me") >= aa(startCol)
    // window results must be plain columns BEFORE they feed the
    // generator expression (Spark rejects window fns inside Generate)
    val w = Window.partitionBy(col("__graft_aid")).orderBy(col("__graft_ms"))
    val j = aa.join(mb, cond, "left_outer")
      .withColumn("__graft_prev_end", lag(col("__graft_me"), 1).over(w))
      .withColumn("__graft_is_last",
        lead(col("__graft_ms"), 1).over(w).isNull)
    val aS = col(startCol).cast("long")
    val aE = col(endCol).cast("long")
    // gap before each overlapping region + the tail after the last one;
    // empty/invalid fragments filter out (s > e), so regions poking past
    // either edge of `a` need no special cases. The ±1 shifts are guarded
    // against Long-extreme wrap: a before-fragment needs m_start > a_start
    // (so m_start−1 cannot underflow) and a tail needs m_end < a_end (so
    // m_end+1 cannot overflow); prev_end+1 is safe because merged regions
    // are separated by ≥1 uncovered coordinate (prev_end < m_start − 1).
    def validFrags(c: Column): Column = filter(c,
      fr => fr("s").isNotNull && fr("e").isNotNull && fr("s") <= fr("e"))
    // unmatched rows get the SAME sanity filter as matched ones: an
    // inverted or NULL-bounded `a` row must emit no fragments either way
    val fragments = when(col("__graft_ms").isNull,
        validFrags(array(struct(aS.as("s"), aE.as("e")))))
      .otherwise(validFrags(array(
          struct(coalesce(col("__graft_prev_end") + 1L, aS).as("s"),
            when(col("__graft_ms") > aS, col("__graft_ms") - 1L).as("e")),
          struct(when(col("__graft_is_last") && col("__graft_me") < aE,
              col("__graft_me") + 1L).as("s"),
            when(col("__graft_is_last"), aE).as("e")))))
    j.withColumn("__graft_fr", explode(fragments))
      .select(a.columns.map(col) ++ Seq(
        col("__graft_fr.s").as("frag_start"),
        col("__graft_fr.e").as("frag_end")): _*)
  }

  /** Interval complement (bedtools complement): the uncovered sub-ranges
    * of each key's EXTENT — `extents` gives one row per key with the
    * full range (e.g. chromosome lengths); the result is the extent
    * minus every covered interval. A pure delegation to
    * [[subtractIntervals]] (extents are the `a` side), so it inherits
    * the merge + indexed-LEFT-OUTER-join + gap-window plan. Output:
    * extent columns + `frag_start` / `frag_end`. */
  def complementIntervals(df: DataFrame, extents: DataFrame,
      keyCols: Seq[String], startCol: String, endCol: String): DataFrame =
    subtractIntervals(extents, df, keyCols, startCol, endCol)

  /** Per-key coverage summary over the merged regions: distinct covered
    * region count, total covered bases (end-inclusive lengths), widest
    * region, and how many raw intervals merged away. */
  def coverageStats(df: DataFrame, keyCols: Seq[String], startCol: String,
      endCol: String, maxGap: Long = 0L): DataFrame = {
    val keys: Seq[Column] = keyCols.map(col)
    // cast-to-long BEFORE the per-row length arithmetic: an int-typed
    // merged region spanning > Int.MaxValue coordinates would overflow
    // (same hygiene as intervalSetJaccard / depthHistogram)
    mergeIntervals(df, keyCols, startCol, endCol, maxGap)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_regions"),
        sum(col("merged_end").cast("long") -
          col("merged_start").cast("long") + 1L)
          .as("covered_bases"),
        max(col("merged_end").cast("long") -
          col("merged_start").cast("long") + 1L)
          .as("max_region_len"),
        sum(col("n_merged")).as("n_intervals"))
  }
}
