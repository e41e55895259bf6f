package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cold-vs-warm STAGE attribution for the composed curation report
  * (r16 verdict #4: sf10 q127 ran 344.3 s cold but 119.6 s on a warm
  * second run in the same JVM — two-thirds of the cold wall is
  * something reusable, and nobody had attributed it). Runs the
  * pipeline's stages with a localCheckpoint barrier between each (so a
  * stage's wall bills ONLY its own work, not upstream recompute) for
  * `passes` passes in one JVM; the per-stage pass-1 minus pass-2 delta
  * IS the attribution. Checkpoints are freed between passes, so pass 2
  * measures true warm re-execution (JIT/codegen + page cache + heap
  * sizing), never block reuse. Prints one JSON line per pass plus a
  * delta line. Same session shape as BenchScale (local[32], 32
  * shuffle partitions, 4g maxResultSize) and the same q127 corpus
  * derivation (near-dup + exact-dup families over `documents`).
  */
object CurationColdProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf10")
    val passes = if (args.length > 1) args(1).toInt else 2
    // "capped" switches stage 3 to q138's exact shape (budgeted
    // single-pass banding, maxBucketSize=64, 1 M candidate budget) so
    // the q138-vs-q127 premium gets a per-stage attribution instead of
    // an end-to-end subtraction (r18: pre-touched sf10 reads q138
    // 188.9 s vs q127 72.4 — WHERE the deferred-family cost lands is
    // the question this mode answers)
    val capped = args.length > 2 && args(2) == "capped"
    // optional candidate cap for the containment stage (args(3), docs
    // per contained-side doc; 0 = off): the r18 lever measured against
    // the 177 s / 31 GB-spill containment stage the capped pipeline
    // pays on the deferred families
    val candCap = if (args.length > 3) args(3).toInt else 0
    def loadavg: String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split("\\s+").take(3).mkString(",")
      catch { case _: Exception => "" }
    val loadStart = loadavg
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.install(spark)
    if (candCap > 0) spark.conf.set(
      graft.operators.Dedup.ContainmentMaxCandidatesConf,
      candCap.toString)
    val shim = org.apache.spark.sql.GraftSqlShim
    import graft.operators.{Dedup, TextStats}
    // task-metric accumulator: per-stage deltas of executor run/GC
    // time, spill and shuffle volume — the numbers that separate
    // "first pass JITs" from "first pass thrashes the heap" from
    // "first pass writes cold shuffle files" (r16 verdict #4 wants the
    // MECHANISM named, not just the stage)
    val mRun = new java.util.concurrent.atomic.AtomicLong
    val mGc = new java.util.concurrent.atomic.AtomicLong
    val mSpillMem = new java.util.concurrent.atomic.AtomicLong
    val mSpillDisk = new java.util.concurrent.atomic.AtomicLong
    val mShufW = new java.util.concurrent.atomic.AtomicLong
    val mShufR = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            mRun.addAndGet(m.executorRunTime)
            mGc.addAndGet(m.jvmGCTime)
            mSpillMem.addAndGet(m.memoryBytesSpilled)
            mSpillDisk.addAndGet(m.diskBytesSpilled)
            mShufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            mShufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          }
        }
      })

    def corpus: DataFrame = {
      val docs = graft.Tables.load(spark, dir, "documents")
        .select("doc_id", "text")
      val exact = docs.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
      val nearDf = docs.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 2000000).as("doc_id"),
          concat(col("text"), lit(" graft dup marker")).as("text"))
      docs.union(exact).union(nearDf)
    }

    val allPasses =
      scala.collection.mutable.ArrayBuffer.empty[Seq[(String, Double)]]
    for (p <- 1 to passes) {
      val stages = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      def timed[T](name: String)(body: => T): T = {
        val s0 = (mRun.get, mGc.get, mSpillMem.get, mSpillDisk.get,
          mShufW.get, mShufR.get)
        val t0 = System.nanoTime()
        val r = body
        val w = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously; brief settle before the
        // snapshot (listenerBus.waitUntilEmpty is private[spark]; at
        // stage granularity a fixed pause loses at most a task or two
        // of attribution)
        Thread.sleep(500)
        stages += (name -> w)
        println(f"CURCOLD pass=$p stage=$name wall=$w%.2f " +
          f"runSec=${(mRun.get - s0._1) / 1e3}%.1f " +
          f"gcSec=${(mGc.get - s0._2) / 1e3}%.1f " +
          f"spillMemMB=${(mSpillMem.get - s0._3) >> 20} " +
          f"spillDiskMB=${(mSpillDisk.get - s0._4) >> 20} " +
          f"shufWriteMB=${(mShufW.get - s0._5) >> 20} " +
          f"shufReadMB=${(mShufR.get - s0._6) >> 20}")
        r
      }
      val ckpts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      def ck(df: DataFrame): DataFrame = {
        val c = df.localCheckpoint(); ckpts += c; c
      }
      // stage 1: corpus scan + langId/quality kernels (q127's `base`)
      val base = timed("base_kernels") {
        val b = ck(corpus
          .withColumn("lang_ok", TextStats.langId(col("text")) === "en")
          .withColumn("quality_ok",
            TextStats.qualityScore(col("text")) >= 0.55))
        b.count(); b
      }
      val gated = base.where(col("lang_ok") && col("quality_ok"))
        .select("doc_id", "text")
      // stage 2: exact-dup star edges (fingerprint window)
      val stars = timed("exact_stars") {
        val s = ck(Dedup.exactDupStars(gated, "doc_id", "text"))
        s.count(); s
      }
      // stage 3: MinHash banding + Jaccard verify — uncapped (q127) or
      // q138's budgeted capped shape
      val near = timed("lsh_verify") {
        val pairs = if (capped)
          Dedup.minhashDupPairsBudgeted(gated, "doc_id", "text", 0.95,
            maxBucketSize = 64, candidateBudget = 1000000L)
        else Dedup.minhashDupPairs(gated, "doc_id", "text", 0.95)
        val n = ck(pairs.select("id1", "id2"))
        n.count(); n
      }
      // stage 4: connected components over the near-dup graph
      val nearLosers = timed("cc") {
        val l = ck(Dedup.connectedComponents(near.unionByName(stars))
          .where(col("id") =!= col("group_id"))
          .select(col("id").as("doc_id")))
        l.count(); l
      }
      // stage 5: survivor anti-join
      val survivors = timed("survivors") {
        val s = ck(gated.join(nearLosers, Seq("doc_id"), "left_anti"))
        s.count(); s
      }
      // stage 6: containment (3-tier verify)
      val contPairs = timed("containment") {
        val c = ck(Dedup.containmentDupPairs(survivors, "doc_id", "text",
          0.9))
        c.count(); c
      }
      // stage 7: loser resolution + final report joins
      // (containmentLosers is private[operators]; same rule inlined —
      // a (contained, container) row eliminates `contained` unless the
      // reverse row exists and contained has the lower id)
      timed("report_joins") {
        val rev = contPairs.select(
          col("id_contained").as("r_container"),
          col("id_container").as("r_contained"))
        val contLosers = contPairs
          .join(rev, col("id_contained") === col("r_contained") &&
            col("id_container") === col("r_container"), "left")
          .where(col("r_contained").isNull ||
            col("id_contained") > col("id_container"))
          .select(col("id_contained").as("doc_id"))
          .distinct()
          .withColumn("cont_loser", lit(true))
        base
          .join(nearLosers.withColumn("near_loser", lit(true)),
            Seq("doc_id"), "left")
          .join(contLosers, Seq("doc_id"), "left")
          .select(col("doc_id"),
            when(!col("lang_ok"), "lang")
              .when(!col("quality_ok"), "quality")
              .when(col("near_loser"), "near_dup")
              .when(col("cont_loser"), "contained")
              .as("dropped"))
          .count()
        // A/B evidence for the candidate cap: the capped run's pair
        // volume collapses while the contained-loser SET should not
        // (one true container per loser suffices for the rule)
        println(s"CURCOLD pass=$p cont_pairs=${contPairs.count()} " +
          s"cont_losers=${contLosers.count()}")
      }
      allPasses += stages.toSeq
      ckpts.foreach(shim.unpersistCheckpoint)
    }
    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def js(stages: Seq[(String, Double)]) = stages
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    allPasses.zipWithIndex.foreach { case (s, i) =>
      println(s"""{"metric":"curation_cold","pass":${i + 1},"capped":$capped,"cand_cap":$candCap,"stages":${js(s)},"total":${fmt(s.map(_._2).sum)},"dir":"$dir","loadavg_start":"$loadStart","loadavg_now":"$loadavg"}""")
    }
    if (allPasses.size >= 2) {
      val cold = allPasses.head.toMap
      val warm = allPasses(1)
      val delta = warm.map { case (k, w) => k -> (cold(k) - w) }
      println(s"""{"metric":"curation_cold_delta","cold_minus_warm":${js(delta)},"total_delta":${fmt(delta.map(_._2).sum)}}""")
    }
    spark.stop()
  }
}
