package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Root-cause probe for the q138-vs-q127 premium (capped curation
  * slower than uncapped at GenScale decades even after the r16
  * single-pass fix): decomposes both variants' near-dup stages and the
  * downstream containment input so the delta can be attributed —
  * either harness overhead (bucket checkpoint/profile) or the cap's
  * SEMANTIC trade (dropped oversized buckets → fewer near-dup losers
  * → more survivors into the containment stage). Diagnostic only.
  *
  * Usage: runMain graft.tools.CurationCapProbe [dir] [budget]
  */
object CurationCapProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf1")
    val budget = if (args.length > 1) args(1).toLong else 1000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.install(spark)
    val D = graft.operators.Dedup

    // the q127/q138 corpus (SparkEntry dupCorpus(near = true) shape)
    val docs0 = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val corpus = docs0
      .union(docs0.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      .union(docs0.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 2000000).as("doc_id"),
          concat(col("text"), lit(" graft dup marker")).as("text")))
    val base = corpus
      .withColumn("lang_ok",
        graft.operators.TextStats.langId(col("text")).isin("en"))
      .withColumn("quality_ok",
        graft.operators.TextStats.qualityScore(col("text")) >= 0.55)
      .localCheckpoint()
    val gated = base.where(col("lang_ok") && col("quality_ok"))
      .select("doc_id", "text").localCheckpoint()
    println(s"PROBE gated=${gated.count()}")

    def t(name: String)(f: => Any): Unit = {
      val s = System.nanoTime()
      val r = f
      println(f"PROBE $name%-36s ${(System.nanoTime() - s) / 1e9}%8.3f s  $r")
    }
    val cap = D.lshAutoCap(gated, "doc_id", "text", candidateBudget = budget)
    println(s"PROBE autoCap=$cap (budget $budget)")
    t("cands uncapped")(
      D.lshCandidatePairs(gated, "doc_id", "text").count())
    t("cands capped")(
      D.lshCandidatePairs(gated, "doc_id", "text",
        maxBucketSize = math.min(64, cap)).count())
    var upPairs = 0L
    var capPairs = 0L
    t("minhashDupPairs uncapped")(
      { upPairs = D.minhashDupPairs(gated, "doc_id", "text", 0.95).count()
        upPairs })
    t("minhashDupPairsBudgeted")(
      { capPairs = D.minhashDupPairsBudgeted(gated, "doc_id", "text", 0.95,
          maxBucketSize = 64, candidateBudget = budget).count()
        capPairs })
    // near-dup losers + containment-stage input under each variant
    def losers(pairs: org.apache.spark.sql.DataFrame): Long =
      D.connectedComponents(pairs.select("id1", "id2"))
        .where(col("id") =!= col("group_id")).count()
    var lu = 0L
    var lc = 0L
    t("losers uncapped")({ lu = losers(
      D.minhashDupPairs(gated, "doc_id", "text", 0.95)); lu })
    t("losers capped")({ lc = losers(
      D.minhashDupPairsBudgeted(gated, "doc_id", "text", 0.95,
        maxBucketSize = 64, candidateBudget = budget)); lc })
    println(s"PROBE survivors uncapped=${gated.count() - lu} " +
      s"capped=${gated.count() - lc}")
    // containment stage cost on each survivor set
    def contain(loserPairs: org.apache.spark.sql.DataFrame): Long = {
      val l = D.connectedComponents(loserPairs.select("id1", "id2"))
        .where(col("id") =!= col("group_id"))
        .select(col("id").as("doc_id"))
      val surv = gated.join(l, Seq("doc_id"), "left_anti")
      D.containmentDupPairs(surv, "doc_id", "text", 0.9).count()
    }
    t("containment on uncapped-survivors")(
      contain(D.minhashDupPairs(gated, "doc_id", "text", 0.95)))
    t("containment on capped-survivors")(
      contain(D.minhashDupPairsBudgeted(gated, "doc_id", "text", 0.95,
        maxBucketSize = 64, candidateBudget = budget)))
    spark.stop()
  }
}
