package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-exchange attribution of the containment candidate cap's shuffle
  * premium (r18 handoff: with the cap armed the containment stage
  * writes 28.5-32 GB of shuffle at the 100x GenScale decade where the
  * uncapped verify writes 4.0 GB on the SAME candidate stream — "same
  * rows, ~1.5x wider" explains ~1.5x of the 7x; the rest was
  * unattributed). This tool decomposes the capped chain into its
  * individual exchanges and times each as its own job with per-JOB
  * task metrics (bytes AND records, so row-count inflation separates
  * from row-width inflation) plus a per-STAGE metric log.
  *
  * Usage: runMain graft.tools.ContainmentAttrib <sfDir> [steps...]
  *   steps default: raw distinct cnt cap1 cap32 full0 full32
  * Corpus: the q138-shaped survivors (capped-LSH pipeline) — the same
  * derivation as CurationColdProbe, checkpointed once untimed.
  */
object ContainmentAttrib {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf1")
    val steps = if (args.length > 1) args.drop(1).toSet
      else Set("raw", "distinct", "cnt", "cap1", "cap32", "full0", "full32")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.install(spark)
    import graft.operators.{Dedup, TextStats}

    // per-stage metric log: stage id + name prefix + task count +
    // shuffle bytes/records + spill, printed as each stage completes —
    // the per-job totals below say WHICH sub-plan is expensive, this
    // says WHICH EXCHANGE inside it
    val mRun = new java.util.concurrent.atomic.AtomicLong
    val mShufWB = new java.util.concurrent.atomic.AtomicLong
    val mShufWR = new java.util.concurrent.atomic.AtomicLong
    val mShufRB = new java.util.concurrent.atomic.AtomicLong
    val mSpillMem = new java.util.concurrent.atomic.AtomicLong
    val mSpillDisk = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            mRun.addAndGet(m.executorRunTime)
            mShufWB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            mShufWR.addAndGet(m.shuffleWriteMetrics.recordsWritten)
            mShufRB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            mSpillMem.addAndGet(m.memoryBytesSpilled)
            mSpillDisk.addAndGet(m.diskBytesSpilled)
          }
        }
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val m = si.taskMetrics
          if (m != null && (m.shuffleWriteMetrics.bytesWritten > 0 ||
              m.memoryBytesSpilled > 0)) {
            println(f"STAGE id=${si.stageId} tasks=${si.numTasks} " +
              f"wMB=${m.shuffleWriteMetrics.bytesWritten >> 20} " +
              f"wRec=${m.shuffleWriteMetrics.recordsWritten} " +
              f"rMB=${m.shuffleReadMetrics.totalBytesRead >> 20} " +
              f"spillMemMB=${m.memoryBytesSpilled >> 20} " +
              f"spillDiskMB=${m.diskBytesSpilled >> 20} " +
              f"name=${si.name.takeWhile(_ != '\n').take(60)}")
          }
        }
      })

    def timed[T](name: String)(body: => T): T = {
      val s0 = (mRun.get, mShufWB.get, mShufWR.get, mShufRB.get,
        mSpillMem.get, mSpillDisk.get)
      val t0 = System.nanoTime()
      val r = body
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"ATTRIB step=$name wall=$w%.2f " +
        f"runSec=${(mRun.get - s0._1) / 1e3}%.1f " +
        f"shufWriteMB=${(mShufWB.get - s0._2) >> 20} " +
        f"shufWriteRec=${mShufWR.get - s0._3} " +
        f"shufReadMB=${(mShufRB.get - s0._4) >> 20} " +
        f"spillMemMB=${(mSpillMem.get - s0._5) >> 20} " +
        f"spillDiskMB=${(mSpillDisk.get - s0._6) >> 20}")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // q138-shaped survivors (CurationColdProbe's capped-mode stages
    // 1-5), checkpointed untimed
    val docs = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "text")
    val exact = docs.where(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
    val nearDf = docs.where(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 2000000).as("doc_id"),
        concat(col("text"), lit(" graft dup marker")).as("text"))
    val corpus = docs.union(exact).union(nearDf)
    val base = corpus
      .withColumn("lang_ok", TextStats.langId(col("text")) === "en")
      .withColumn("quality_ok", TextStats.qualityScore(col("text")) >= 0.55)
      .localCheckpoint()
    val gated = base.where(col("lang_ok") && col("quality_ok"))
      .select("doc_id", "text")
    val stars = Dedup.exactDupStars(gated, "doc_id", "text")
    val near = Dedup.minhashDupPairsBudgeted(gated, "doc_id", "text", 0.95,
      maxBucketSize = 64, candidateBudget = 1000000L)
      .select("id1", "id2").localCheckpoint()
    val losers = Dedup.connectedComponents(near.unionByName(stars))
      .where(col("id") =!= col("group_id"))
      .select(col("id").as("doc_id")).localCheckpoint()
    val survivors = gated.join(losers, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    println(s"ATTRIB survivors=${survivors.count()}")

    // the containment function's own internals, reproduced with the
    // default parameters (threshold 0.9, shingleSize 3, probeK 8,
    // maxShingleDf 16384) — same code shapes, measured in isolation
    val sh = survivors.where(col("text").isNotNull)
      .select(col("doc_id").as("id"),
        Dedup.shingleHashes(col("text"), 3).as("sh"))
      .localCheckpoint()
    val inv = sh.select(col("id").as("id_b"), explode(col("sh")).as("h"))
    val hot = inv.groupBy("h").agg(count(lit(1)).as("df"))
      .where(col("df") > 16384L).select("h")
    val invKept = inv.join(hot, Seq("h"), "left_anti")
    val probes = sh.select(col("id").as("id_a"),
      explode(slice(col("sh"), 1, 8)).as("h"))
    val cands = probes.join(invKept, Seq("h"))
      .where(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b")

    if (steps("plans")) {
      println("==== plan: cands ===="); cands.explain("formatted")
      println("==== plan: cands.distinct ===="); cands.distinct().explain("formatted")
      println("==== plan: pair_count_agg ====")
      cands.groupBy("id_a", "id_b").agg(count(lit(1)).as("__nsh"))
        .explain("formatted")
      println("ATTRIB raw_cands_rows=" + cands.count())
    }
    if (steps("raw")) timed("raw_cands")(noop(cands))
    if (steps("distinct")) timed("cands_distinct")(noop(cands.distinct()))
    if (steps("cnt")) {
      val agg = cands.groupBy("id_a", "id_b").agg(count(lit(1)).as("__nsh"))
      timed("pair_count_agg")(noop(agg))
    }
    if (steps("cap1")) {
      val agg = cands.groupBy("id_a", "id_b").agg(count(lit(1)).as("__nsh"))
      val argmin = agg.groupBy("id_a")
        .agg(min(struct((-col("__nsh")).as("__neg"),
          col("id_b").as("id_b"))).as("__m"))
        .select(col("id_a"), col("__m.id_b").as("id_b"))
      timed("cap1_argmin")(noop(argmin))
    }
    if (steps("cap32")) {
      val conf = Dedup.ContainmentMaxCandidatesConf
      spark.conf.set(conf, "32")
      try {
        // full containment call so the private capPairs/heap path runs
        timed("full_verify_cap32") {
          println("ATTRIB cont_pairs_cap32=" +
            Dedup.containmentDupPairs(survivors, "doc_id", "text", 0.9)
              .count())
        }
      } finally spark.conf.unset(conf)
    }
    if (steps("full0")) {
      timed("full_verify_uncapped") {
        println("ATTRIB cont_pairs_uncapped=" +
          Dedup.containmentDupPairs(survivors, "doc_id", "text", 0.9)
            .count())
      }
    }
    if (steps("full32")) {
      val conf = Dedup.ContainmentMaxCandidatesConf
      spark.conf.set(conf, "1")
      try {
        timed("full_verify_cap1") {
          println("ATTRIB cont_pairs_cap1=" +
            Dedup.containmentDupPairs(survivors, "doc_id", "text", 0.9)
              .count())
        }
      } finally spark.conf.unset(conf)
    }
    spark.stop()
  }
}
