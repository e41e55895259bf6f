package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * End-to-end curation with an AUDIT TRAIL — the composed pipeline a
 * training-data curator actually runs, as ONE call that reports, for
 * every input document, whether it survives and (if not) the FIRST
 * stage that dropped it. The report form matters operationally: at
 * 100 TB you tune thresholds from the per-stage drop counts, and an
 * auditable reason per document is what makes a curation run
 * reviewable (and reproducible) instead of a black-box filter.
 *
 * Stage order (first failing stage wins, pinned — the DuckDB oracle
 * replays the same precedence):
 *
 *   1. `lang`      — language-ID not in the allow list
 *   2. `quality`   — composite quality score below `minQuality`
 *   3. `near_dup`  — non-canonical member of a >= `nearThreshold`
 *                    Jaccard duplicate group (lowest id survives),
 *                    groups computed among stage-1/2 survivors only
 *   4. `contained` — shingle-subset of another stage-3 survivor
 *                    ([[Dedup.removeContained]] rule: mutual classes
 *                    keep the lower id)
 *   5. `contaminated` — (only when an eval corpus is supplied) >=
 *                    `decontaminationThreshold` Jaccard against ANY
 *                    eval document ([[Dedup.crossCorpusDupPairs]],
 *                    eval side broadcast size-gated) — checked LAST so
 *                    a doc dropped for pipeline-internal reasons never
 *                    masks as an eval hit
 *
 * Scale shape: each stage reuses the already-proven operator (compiled
 * text kernels map-side; LSH-bucketed near-dup; bottom-k-sketch
 * containment); the dedup stages run on the gate SURVIVORS only, so
 * low-quality bulk never reaches a shuffle; the report join brings
 * back only 9-to-17-byte loser rows.
 */
object Curation {

  /** `lshMaxBucketSize` arms [[Dedup.lshCandidatePairs]]'s
    * oversized-bucket guard inside the near-dup stage. The composed
    * pipeline inherits LSH's one quadratic term: a corpus whose largest
    * dup family has m members emits C(m,2) candidates per band, and
    * each candidate then pays the Jaccard-verify join — measured at the
    * 100x GenScale point (100-member families), the UNCAPPED near-dup
    * stage dominates the whole report's wall. Capped runs skip buckets
    * over the limit — but BYTE-EQUAL family members still collapse,
    * because exact-duplicate star edges ([[Dedup.exactDupStars]],
    * corpus-linear) always ride along with the LSH pairs; the recall
    * cost falls only on NON-exact near-dup pairs hidden inside
    * oversized buckets in every band. Every other stage is unchanged.
    * Default off.
    *
    * `lshCandidateBudget` is the AUTO-CAP mode: when > 0, the cap is
    * picked from the measured bucket profile of the gated corpus
    * ([[Dedup.lshAutoCap]] — the largest size whose cumulative
    * candidate volume fits the budget) instead of requiring the caller
    * to know the family-size distribution in advance; the effective
    * cap is `min(lshMaxBucketSize, autoCap)`. Costs one extra profile
    * aggregation over the gate survivors. Default off.
    *
    * When to arm it: for SURVIVAL, not small-decade speed. In the
    * composed report, families the cap skips that are NOT byte-equal
    * (the exact-star edges collapse byte-equal ones linearly) defer to
    * the containment stage, whose guarded per-family work can cost
    * more than the skipped LSH verify at decades where the uncapped
    * verify still completes (measured r16 at 100x GenScale, whose
    * copies are deliberately suffix-perturbed: capped 496-546 s vs
    * uncapped 344 s cold). The cap's value is at the decades where
    * C(m,2) makes the uncapped stage not complete at all. */
  def curationReport(docs: DataFrame, idCol: String, textCol: String,
      langs: Seq[String] = Seq("en"), minQuality: Double = 0.5,
      nearThreshold: Double = 0.8,
      containThreshold: Double = 0.9,
      evalDocs: Option[DataFrame] = None,
      evalIdCol: String = "doc_id", evalTextCol: String = "text",
      decontaminationThreshold: Double = 0.8,
      lshMaxBucketSize: Int = Int.MaxValue,
      lshCandidateBudget: Long = 0L): DataFrame = {
    require(langs.nonEmpty, "curationReport needs a language allow-list")
    // materialization rule (same as the containment shingle frame):
    // `base` feeds the near-dup pipeline, the containment pipeline and
    // the final report join — three subtree references, each of which
    // would re-run the langId/quality kernels over the full corpus.
    // One eager localCheckpoint computes them once; blocks are
    // ContextCleaner-freed when the report is GC'd. (At extreme scale
    // a deployment may prefer recomputing two zero-shuffle map kernels
    // over storing corpus-sized blocks — that trade is a policy knob,
    // not a correctness one.)
    val base = docs
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("lang_ok",
        TextStats.langId(col("text")).isin(langs: _*))
      .withColumn("quality_ok",
        TextStats.qualityScore(col("text")) >= minQuality)
      .localCheckpoint()
    val gated = base.where(col("lang_ok") && col("quality_ok"))
      .select("doc_id", "text")
    // auto-cap mode rides ONE banding pass ([[Dedup
    // .minhashDupPairsBudgeted]]): lshAutoCap-then-minhashDupPairs ran
    // the shingle+MinHash+banding pipeline twice over the gate
    // survivors, and at the 100x GenScale decade the second pass cost
    // more than the cap saved (q138 393.5 s vs q127 345.9 s, r15
    // SCALE). The effective cap and emitted pairs are identical.
    // exact-duplicate STAR edges ride along at corpus-LINEAR cost
    // ([[Dedup.exactDupStars]]): byte-equal copies are Jaccard 1 —
    // members of a >= nearThreshold dup group BY DEFINITION — and at
    // scale they are exactly what oversized LSH buckets are made of.
    // Under an armed cap the LSH stage skips those buckets, and
    // without this union the pipeline paid the saved quadratic back
    // downstream: measured at the 100x GenScale decade (r16 probe),
    // the capped report left 2.6x survivors into the containment
    // stage, which then found 12x the pairs and cost MORE than the
    // uncapped report (q138 531 s vs q127 344 s). With the stars, the
    // cap's documented recall cost falls ONLY on non-exact near-dups
    // hidden in skipped buckets. Uncapped runs are BIT-identical to
    // the pre-star pipeline INCLUDING the zero-shingle corner (r16
    // ADVICE asked whether empty/whitespace byte-equal docs — shingle
    // set ∅ — were newly linked by the stars): they are near-dups in
    // BOTH pipelines, because [[Dedup.jaccard]] defines the
    // empty-union Jaccard as 1.0 (∅ = ∅ exactly) and empty docs share
    // the all-sentinel MinHash signature, so the uncapped LSH stage
    // already buckets and verifies them. The stars therefore PRESERVE
    // that semantics under an armed cap (where the shared-signature
    // bucket is exactly the kind the cap skips) — filtering
    // zero-shingle texts out of the stars would create the divergence
    // it was meant to prevent. Pinned by the zero-shingle parity spec.
    val exactStars = Dedup.exactDupStars(gated, "doc_id", "text")
    val nearPairs = (if (lshCandidateBudget <= 0L)
        Dedup.minhashDupPairs(gated, "doc_id", "text", nearThreshold,
          maxBucketSize = lshMaxBucketSize)
      else
        Dedup.minhashDupPairsBudgeted(gated, "doc_id", "text",
          nearThreshold, maxBucketSize = lshMaxBucketSize,
          candidateBudget = lshCandidateBudget))
      .select(col("id1"), col("id2"))
      .unionByName(exactStars)
    val nearLosers = Dedup.connectedComponents(nearPairs)
      .where(col("id") =!= col("group_id"))
      .select(col("id").as("doc_id"), lit(true).as("near_loser"))
    val survivors = gated
      .join(nearLosers.select("doc_id"), Seq("doc_id"), "left_anti")
    val contPairs = Dedup.containmentDupPairs(survivors, "doc_id", "text",
      containThreshold)
    val contLosers = Dedup.containmentLosers(contPairs)
      .select(col("loser").as("doc_id"), lit(true).as("cont_loser"))
    // decontamination runs over the stage-4 survivors (train side —
    // never shuffled; the eval side broadcasts, size-gated)
    val contamLosers = evalDocs match {
      case None => None
      case Some(ev) =>
        val s4 = survivors
          .join(contLosers.select("doc_id"), Seq("doc_id"), "left_anti")
        Some(Dedup.crossCorpusDupPairs(
            s4, ev.select(col(evalIdCol).as("doc_id"),
              col(evalTextCol).as("text")),
            "doc_id", "text", decontaminationThreshold)
          .select(col("train_id").as("doc_id")).distinct()
          .withColumn("contam_loser", lit(true)))
    }
    val withLosers = base
      .join(nearLosers, Seq("doc_id"), "left")
      .join(contLosers, Seq("doc_id"), "left")
    val full = contamLosers match {
      case None => withLosers.withColumn("contam_loser", lit(false))
      case Some(cl) => withLosers.join(cl, Seq("doc_id"), "left")
    }
    full
      .select(col("doc_id"),
        when(!col("lang_ok"), "lang")
          .when(!col("quality_ok"), "quality")
          .when(col("near_loser"), "near_dup")
          .when(col("cont_loser"), "contained")
          .when(col("contam_loser"), "contaminated")
          .as("reason"))
      .withColumn("keep", col("reason").isNull)
  }

  /** The curated corpus: [[curationReport]]'s keepers joined back to
    * the input rows (all original columns). */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      langs: Seq[String] = Seq("en"), minQuality: Double = 0.5,
      nearThreshold: Double = 0.8,
      containThreshold: Double = 0.9,
      evalDocs: Option[DataFrame] = None,
      evalIdCol: String = "doc_id", evalTextCol: String = "text",
      decontaminationThreshold: Double = 0.8,
      lshMaxBucketSize: Int = Int.MaxValue,
      lshCandidateBudget: Long = 0L): DataFrame = {
    val keepers = curationReport(docs, idCol, textCol, langs, minQuality,
      nearThreshold, containThreshold, evalDocs, evalIdCol, evalTextCol,
      decontaminationThreshold, lshMaxBucketSize, lshCandidateBudget)
      .where(col("keep")).select(col("doc_id").as("graft_keep_id"))
    docs.join(keepers, docs(idCol) === col("graft_keep_id"), "left_semi")
  }
}
