package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling operators for training-data pipelines: data
 * mixing needs reproducible samples — the same rows selected on every
 * run, every cluster size, and every engine — which `rand(seed)` cannot
 * give (it is partition-order-dependent). Everything here keys on the
 * lowercase-hex md5 of row identity, which Spark and DuckDB (and any
 * engine with md5) compute identically, so every operator is
 * oracle-checkable with plain SQL and stable under repartitioning.
 *
 * Scale design: no operator shuffles the full rows more than once, no
 * operator sorts globally, and rate-based selection is a pure map-side
 * filter (zero shuffle).
 */
object Sampling {

  /** Deterministic per-row ordering key: lowercase hex md5 of the id
    * rendered as a string. Uniform, reproducible, engine-portable. */
  def hashKey(id: Column): Column = md5(id.cast("string").cast("binary"))

  /** First 8 hex chars of [[hashKey]] — a uniform draw in [0, 2^32) as a
    * zero-padded hex STRING; comparisons stay lexicographic (= numeric
    * for fixed-width hex), so thresholds are portable string literals. */
  private def hashKey8(c: Column): Column = substring(c, 1, 8)

  /** Threshold literal for `P(key8 < t) = rate`: an 8-hex-char string,
    * `"g"` for rate ≥ 1 (every hex digit < 'g' — keeps all rows), `""`
    * for rate ≤ 0 (nothing sorts below the empty string). A rate just
    * under 1 can still round to 2^32 — that case must ALSO yield `"g"`,
    * because its 9-char hex rendering ("100000000") would compare
    * lexicographically below almost every 8-char key and invert the
    * filter to keep nothing. */
  private[graft] def rateThresholdHex(rate: Double): String =
    if (rate >= 1.0) "g"
    else if (rate <= 0.0) ""
    else {
      val t = math.round(rate * 4294967296.0)
      if (t >= 4294967296L) "g" else f"$t%08x"
    }

  /**
   * Deterministic stratified sample: the `k` rows with the smallest
   * [[hashKey]] per stratum (exact — ties on the full 32-hex key are
   * broken by id, and md5 collisions on distinct ids are negligible).
   * A NULL stratum is its own group (null-safe joins throughout, same
   * as the window's partitioning).
   *
   * Scale: a naive per-stratum `row_number` sorts AND SHUFFLES every
   * stratum in full. Instead, rows are pre-pruned to
   * `hash < min(1, fudge*k/n)` per stratum (n from a narrow
   * map-side-combined count; the prune keeps ~fudge*k rows per
   * stratum), and only survivors — a few thousand rows per stratum
   * regardless of input size — are shuffled and windowed. The prune is
   * validated on the (tiny, persisted) windowed result — if any stratum
   * came back with fewer than min(k, n) rows (probability ≤ exp(-7k)
   * per stratum at the default fudge), the exact unpruned window runs
   * instead, so the result is ALWAYS exact. Cost: two passes over the
   * input (the stratum count + the pruned window), both map-side
   * filters — vs the naive single pass that shuffles everything. The
   * validation runs eagerly at call time; the returned frame is a
   * small eager `localCheckpoint` (cleaned by the context cleaner once
   * unreferenced) and the internal persist is released before return.
   *
   * Precondition: `idCol` must be non-null. `md5(NULL)` is NULL, which
   * sorts first with no deterministic tie-break, so NULL-id rows in
   * small strata would be selected nondeterministically (and diverge
   * from any md5-based oracle). Filter or impute ids first —
   * [[mixtureSample]]/[[hashSplit]] handle NULLs explicitly because
   * their per-row decisions never need a tie-break.
   */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      k: Int, fudge: Double = 16.0): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    require(fudge >= 2.0, s"fudge must be >= 2 (got $fudge)")
    val keyed = df.withColumn("__gk", hashKey(col(idCol)))
    val w = Window.partitionBy(strataCol).orderBy(col("__gk"), col(idCol))
    def topK(in: DataFrame): DataFrame =
      in.withColumn("__grn", row_number().over(w))
        .where(col("__grn") <= k).drop("__gk", "__grn")
    // the counts side carries an internally-named key: both join inputs
    // derive from df, and same-name column references across such a
    // self-join are ambiguous to the analyzer
    val counts = df.groupBy(strataCol).agg(count(lit(1)).as("__gn"))
      .withColumnRenamed(strataCol, "__gs")
    // per-stratum keep fraction min(1, fudge*k/n) as a portable hex bound
    val frac = conv(hashKey8(col("__gk")), 16, 10).cast("double") / 4294967296.0
    // null-safe equi-join: a NULL stratum must keep its count row (an
    // equi-join would silently drop the whole null group)
    val cjoin = keyed.join(broadcast(counts),
      col(strataCol) <=> col("__gs"), "inner").drop("__gs")
    val pruned = cjoin.where(col("__gn") <= lit(fudge * k) ||
      frac < lit(fudge * k) / col("__gn"))
    // validate on the WINDOWED result (≤ k rows per stratum, persisted):
    // no extra scan of the input
    val sampled = topK(pruned.drop("__gn")).persist()
    val got = sampled.groupBy(strataCol).agg(count(lit(1)).as("__gm"))
      .withColumnRenamed(strataCol, "__gt")
    val ok = got.join(broadcast(counts),
        col("__gt") <=> col("__gs"), "right_outer")
      .where(coalesce(col("__gm"), lit(0L)) <
        least(lit(k.toLong), col("__gn")))
      .isEmpty
    // re-select the caller's column order (the prune join moved the
    // strata key to the front)
    val cols = df.columns.map(col).toIndexedSeq
    if (ok) {
      val out = sampled.select(cols: _*).localCheckpoint()
      sampled.unpersist()
      out
    } else {
      sampled.unpersist()
      topK(keyed).select(cols: _*)
    }
  }

  /**
   * Deterministic rate-based mixture sampling: keep each row with
   * per-stratum probability `rates(stratum)` (else `defaultRate`),
   * decided by the row's own hash — a pure map-side filter, zero
   * shuffle, reproducible at any scale. The hash keys on
   * `(stratum, id)` so selections are independent of [[stratifiedSample]]
   * and of other columns' sampling. A NULL stratum takes `defaultRate`;
   * NULL strata/ids hash via a sentinel (instead of null-propagating
   * into a silent drop), so all-NULL-id rows of one stratum share one
   * hash draw.
   */
  def mixtureSample(df: DataFrame, strataCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    val thr = rates.toSeq.sortBy(_._1).foldLeft(
      lit(rateThresholdHex(defaultRate))) { case (acc, (s, r)) =>
        when(col(strataCol) === s, lit(rateThresholdHex(r))).otherwise(acc) }
    val key = hashKey8(md5(
      concat(coalesce(col(strataCol).cast("string"), lit("\u0000")),
        lit(":"),
        coalesce(col(idCol).cast("string"), lit("\u0000")))
        .cast("binary")))
    df.where(key < thr)
  }

  /**
   * Temperature-flattened mixture sampling (the mT5/UniMax
   * multilingual rule): sampling mass p_g ∝ n_g^tau, so tau = 1
   * preserves natural proportions and tau → 0 approaches uniform
   * across groups — the standard fix for head languages/sources
   * drowning the tail. Keeps each group-g row with probability
   * `r_g = min(1, targetFraction · N · p_g / n_g)`, decided by the
   * same deterministic per-row md5 draw as [[mixtureSample]] (the
   * comparison is numeric here — the threshold is a computed COLUMN,
   * not a literal).
   *
   * Exactness across engines: group weights are QUANTIZED —
   * `w_g = round(n_g^tau · 10^6)` as integers — so the normalizing
   * sum is an exact integer (order-independent; a raw double sum
   * would vary with partition order), and every downstream value is
   * derived from integers by pinned left-to-right IEEE arithmetic an
   * external SQL checker can replay bit-for-bit. (`tau = 0.5` is
   * additionally pow-exact everywhere: IEEE sqrt.)
   *
   * Scale shape: one map-side-combined count per group, a 1-row
   * totals broadcast, a broadcast rates join, then a pure map-side
   * hash filter — zero data shuffles.
   */
  def temperatureMixture(df: DataFrame, strataCol: String, idCol: String,
      tau: Double, targetFraction: Double): DataFrame = {
    require(tau >= 0 && tau <= 1, s"tau must be in [0,1] (got $tau)")
    require(targetFraction > 0 && targetFraction <= 1,
      s"targetFraction must be in (0,1] (got $targetFraction)")
    val counts = df.groupBy(strataCol).agg(count(lit(1)).as("__n"))
      .withColumn("__q",
        round(pow(col("__n").cast("double"), tau) * 1000000.0, 0)
          .cast("long"))
    val tot = counts.agg(sum("__n").cast("double").as("__nt"),
      sum("__q").cast("double").as("__qt"))
    val rates = counts.crossJoin(broadcast(tot))
      .select(col(strataCol),
        least(lit(1.0),
          lit(targetFraction) * col("__nt") * col("__q").cast("double") /
            col("__qt") / col("__n").cast("double")).as("__rate"))
    val key = conv(substring(md5(
      concat(coalesce(col(strataCol).cast("string"), lit("\u0000")),
        lit(":"),
        coalesce(col(idCol).cast("string"), lit("\u0000")))
        .cast("binary")), 1, 8), 16, 10).cast("long")
    // null-safe join: groupBy above already gives NULL strata their own
    // group, and the md5 draw coalesces NULL before hashing — a plain
    // equi-join would then silently drop those rows at the last step.
    // <=> keeps NULL as a first-class stratum end to end.
    val rated = broadcast(
      rates.withColumnRenamed(strataCol, "__graft_strata"))
    df.join(rated, col(strataCol) <=> col("__graft_strata"))
      .where(key < floor(col("__rate") * 4294967296.0).cast("long"))
      .drop("__rate", "__graft_strata")
  }

  /**
   * Token-budget mixture plan — the "data recipe" table a pretraining
   * run is configured from: per source, its document/token inventory,
   * the temperature-weighted share of a global token budget, and the
   * epochs (passes over the source) that share implies. `w_g ∝
   * tokens_g^tau` (tau = 1 → proportional; tau < 1 flattens toward
   * uniform — the mT5/UniMax knob); `tokens_target = round(budget ·
   * q_g / Σq)`; `epochs = round(target / avail, 6)` — epochs > 1
   * flags up-sampling (repetition) a curator may want to cap, the
   * complement of [[temperatureMixture]] which SELECTS docs under an
   * already-chosen budget.
   *
   * Determinism: weights quantize to integer micro-units
   * (`round(avail^tau · 1e6)`, the q131 discipline) so the share
   * arithmetic is bit-replayable; divisions run left to right in
   * doubles and round at fixed scales. Zero-token sources get NULL
   * epochs rather than an engine-dependent 0/0.
   *
   * Scale shape: the corpus collapses map-side to one row per source
   * (token counting is an in-row kernel — text never shuffles); the
   * totals frame is one broadcast row; output is |sources| rows.
   */
  def tokenBudgetPlan(docs: DataFrame, textCol: String, sourceCol: String,
      budgetTokens: Long, tau: Double = 1.0): DataFrame = {
    require(budgetTokens > 0,
      s"budgetTokens must be positive (got $budgetTokens)")
    require(tau >= 0 && tau <= 1, s"tau must be in [0,1] (got $tau)")
    val counts = docs.groupBy(sourceCol).agg(
        count(lit(1)).as("n_docs"),
        sum(TextStats.tokenCount(col(textCol)).cast("long"))
          .as("tokens_avail"))
      .withColumn("__q",
        round(pow(col("tokens_avail").cast("double"), tau) * 1000000.0, 0)
          .cast("long"))
    val tot = counts.agg(sum("__q").cast("double").as("__qt"))
    counts.crossJoin(broadcast(tot))
      .select(col(sourceCol), col("n_docs"), col("tokens_avail"),
        // all-zero-token corpus: every weight is 0, so Σq = 0 and the
        // share is 0/0 — pin it to 0 rather than an engine-dependent
        // NaN cast (Spark non-ANSI casts NaN→0L; DuckDB errors)
        when(col("__qt") === 0.0, lit(0L))
          .otherwise(round(lit(budgetTokens).cast("double") *
            col("__q").cast("double") / col("__qt"), 0).cast("long"))
          .as("tokens_target"))
      .withColumn("epochs",
        when(col("tokens_avail") === 0, lit(null).cast("double"))
          .otherwise(round(col("tokens_target").cast("double") /
            col("tokens_avail").cast("double"), 6)))
  }

  /**
   * Deterministic sequence packing (concat-then-chunk, the GPT-style
   * pretraining layout): rows are bucketed by a hash prefix for
   * parallelism, deterministically ordered within each bucket by
   * [[hashKey]], and assigned `pack_id = floor(running_weight_before /
   * capacity)` — the chunk of the bucket's concatenated stream the row's
   * START falls in. Adds `bucket` (`bucketChars` hex chars —
   * `16^bucketChars` buckets) and `pack_id` columns.
   *
   * Scale: each bucket packs independently (one shuffle on the bucket
   * key, a running-sum window per bucket — external-sort-safe); the
   * serial cumsum dependency is per-bucket, never global, and the
   * default 4096 buckets keep per-bucket streams small enough that the
   * in-task sort parallelizes across any cluster. Determinism comes
   * from the md5 ordering, so the same packs come out on every run and
   * cluster size.
   */
  def packSequences(df: DataFrame, idCol: String, weightCol: String,
      capacity: Long, bucketChars: Int = 3): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1 (got $capacity)")
    require(bucketChars >= 1 && bucketChars <= 8,
      s"bucketChars must be in [1, 8] (got $bucketChars)")
    val key = hashKey(col(idCol))
    val w = Window.partitionBy("bucket").orderBy(key, col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("bucket", substring(key, 1, bucketChars))
      .withColumn("pack_id",
        floor(coalesce(sum(col(weightCol)).over(w), lit(0L)) /
          lit(capacity.toDouble)).cast("long"))
  }

  /**
   * Token-BUDGET-capped deterministic sampling per stratum — the
   * mixture-building step when quotas are token budgets, not document
   * counts ("200 B tokens of web, 50 B of code"): keep each stratum's
   * md5-ordered prefix of documents whose cumulative weight stays within
   * `budget` (strict — the first document that would overshoot is cut,
   * and so is everything after it in hash order). The md5 key makes the
   * SAME prefix come out on every run, cluster size, and engine.
   *
   * Scale shape: one running-sum window per stratum (same as
   * [[packSequences]]); the shuffle carries (id, weight) only. Strata
   * partition the corpus, so parallelism is per-stratum; a single
   * giant stratum bounds the window at one task's sort — budget
   * selection inside one stratum is inherently prefix-sequential, and
   * the window's external sort spills rather than OOMs there.
   * Output keeps `cum_before` (tokens consumed before each kept doc)
   * as the audit column.
   */
  def budgetSample(df: DataFrame, strataCol: String, idCol: String,
      weightCol: String, budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1 (got $budget)")
    val key = hashKey(col(idCol))
    val w = Window.partitionBy(col(strataCol)).orderBy(key, col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("cum_before",
        coalesce(sum(col(weightCol)).over(w), lit(0L)))
      .where(col("cum_before") + col(weightCol) <= budget)
  }

  /**
   * Deterministic train/validation/test split: labels each row by which
   * hash range it falls in — `fractions` in order, remainder going to
   * the last label. Disjoint, exhaustive, reproducible, zero-shuffle
   * (the label is a map-side expression; downstream filters on it).
   * NULL ids have no hash: every null-id row lands in the LAST label
   * (deterministically); filter or impute ids first if that matters.
   */
  def hashSplit(df: DataFrame, idCol: String,
      fractions: Seq[(String, Double)], labelCol: String = "split"): DataFrame = {
    require(fractions.size >= 2, "need at least two split labels")
    require(fractions.forall(_._2 > 0), "fractions must be positive")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1 (got ${fractions.map(_._2).sum})")
    val key = hashKey8(hashKey(col(idCol)))
    val cum = fractions.init.scanLeft(0.0)(_ + _._2).tail
    val label = fractions.init.zip(cum).reverse.foldLeft(
      lit(fractions.last._1)) { case (acc, ((name, _), upTo)) =>
        when(key < lit(rateThresholdHex(upTo)), lit(name)).otherwise(acc) }
    df.withColumn(labelCol, label)
  }
}
