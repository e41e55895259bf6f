package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off diagnostic for sizing the containment verify's over-gate
  * wave (NOT part of the graded surface): prints, for a GenScale dir's
  * dupCorpus, the exact raw/distinct candidate counts, the exact
  * Σ_cand |sh(a)| (the logical row count of the widest exchange), the
  * hash-sampled estimate of the same sum, and the MEASURED shuffle
  * bytes a single 1/16 verify batch actually writes — the number the
  * scratch-budget batching should be sized from. Exists because the
  * r15 session found model (logical bytes) and disk (measured peak)
  * disagreeing ~1000x and the batch count must come from evidence.
  *
  * Usage: runMain graft.tools.ContainmentProbe [dir]
  */
object ContainmentProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf1")
    // batch modulus for the measured verify batch (1/mod of the id_a
    // hash domain) and a flag to skip the exact full-corpus sums (at
    // the 100x decade the exact pass is itself a multi-minute job;
    // the sampled estimate is the number the operator actually uses)
    val batchMod = if (args.length > 1) args(1).toInt else 16
    val skipExact = args.length > 2 && args(2) == "sampled-only"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.install(spark)
    val docs0 = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val corpus = docs0
      .union(docs0.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      .union(docs0.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 2000000).as("doc_id"),
          concat(col("text"), lit(" graft dup marker")).as("text")))

    // mirror containmentDupPairs' candidate pipeline (threshold 0.9,
    // shingle 3, probeK 8, maxShingleDf 16384)
    val sh = corpus.where(col("text").isNotNull)
      .select(col("doc_id").as("id"),
        graft.operators.Dedup.shingleHashes(col("text"), 3).as("sh"))
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
    val sizesA = sh.select(col("id").as("id_a"), size(col("sh")).as("na"))

    val nDocs = sh.count()
    if (nDocs == 0L) {
      println(s"PROBE no non-null documents under $dir — nothing to size")
      spark.stop()
      return
    }
    val sumShRow = sh.agg(sum(size(col("sh")))).head()
    val sumSh = if (sumShRow.isNullAt(0)) 0L else sumShRow.getLong(0)
    println(s"PROBE docs=$nDocs sumSh=$sumSh avgSh=${sumSh / nDocs}")
    if (!skipExact) {
      val raw = cands.count()
      println(s"PROBE rawCand=$raw")
      val dc = cands.distinct()
      val exact = dc.join(sizesA, Seq("id_a")).agg(
        count(lit(1)).as("n"), sum("na").as("s")).head()
      println(s"PROBE distinctCand=${exact.getLong(0)} sumShA=${exact.getLong(1)}")
    }
    val sampledRow = cands
      .where(pmod(xxhash64(col("id_a")), lit(64)) === 0)
      .distinct().join(sizesA, Seq("id_a"))
      .agg(sum("na")).head()
    val sampled = if (sampledRow.isNullAt(0)) 0L else sampledRow.getLong(0)
    println(s"PROBE sampledSumShA=${sampled}  x64=${sampled * 64}")

    // one 1/16 batch of the count-verify, with actual shuffle write
    // bytes summed by a stage-completion listener
    val invA = inv.select(col("id_b").as("id_a"), col("h"))
    val acc = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        acc.addAndGet(e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    val before = 0L
    val t0 = System.nanoTime()
    // resident index sides, mirroring the operator's middle tier
    val batch = cands
      .where(pmod(xxhash64(col("id_a")), lit(batchMod)) === 0)
      .distinct()
      .join(broadcast(invA), Seq("id_a"))
      .join(broadcast(inv), Seq("id_b", "h"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared"))
      .count()
    val wall = (System.nanoTime() - t0) / 1e9
    // listener events are async; block until the bus is actually
    // drained (a fixed sleep under-reported on loaded boxes)
    org.apache.spark.sql.GraftSqlShim.waitListenerBusEmpty(spark)
    val after = acc.get()
    println(f"PROBE batch$batchMod%d pairs=$batch%d wall=$wall%.1f s " +
      s"(full ~ ${(wall * batchMod / 60).toInt} min) " +
      s"shuffleWriteBytes=${after - before}" +
      s" (~${(after - before) / (1L << 20)} MiB)")
    spark.stop()
  }
}
