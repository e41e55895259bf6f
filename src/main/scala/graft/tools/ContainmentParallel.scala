package graft.tools

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures tier-3 containment wave PARALLELISM — the previously
  * projected half of the 100-TB claim. The over-gate shuffled verify
  * splits into hash(id_a) batches; the operator runs them sequentially
  * on one box (scratch-bounded), and the fleet story says independent
  * batches can run CONCURRENTLY because each batch's shuffles are its
  * own (lineage-derived cleanup, no shared state). r15 measured ONE
  * sequential 1/256 batch and extrapolated; this tool runs the SAME
  * k-batch split twice — sequentially, then with `conc` batches in
  * flight at once on a shared session — and records both walls, the
  * summed row counts (must agree with each other and with the operator
  * record: 967,126 verified pairs at the 10x GenScale decade), and the
  * peak scratch draw of each phase, so "batches don't stack scratch
  * beyond concurrency×wave" is a recorded number.
  *
  * The pipeline mirrors [[graft.operators.Dedup.containmentDupPairs]]'s
  * tier-3 count-verify exactly (threshold 0.9, shingle 3, probeK 8,
  * maxShingleDf 16384, both broadcast gates treated as failed), built
  * directly so the batch count and concurrency are controlled inputs
  * rather than scratch-probe outputs.
  *
  * Usage: runMain graft.tools.ContainmentParallel [dir] [k] [conc]
  * Writes target/bench_containment_parallel.json (scale_curve shape,
  * mergeable by tools/assemble_scale.py).
  */
object ContainmentParallel {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf1")
    val k = if (args.length > 1) args(1).toInt else 3
    val conc = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.install(spark)
    def loadavg: String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split("\\s+").take(3).mkString(",")
      catch { case _: Exception => "" }
    val loadStart = loadavg

    val docs0 = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val corpus = docs0
      .union(docs0.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      .union(docs0.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 2000000).as("doc_id"),
          concat(col("text"), lit(" graft dup marker")).as("text")))

    // tier-3 pipeline, operator-identical constants
    val threshold = 0.9
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
    val sizesA = sh.select(col("id").as("id_a"), size(col("sh")).as("__n_a"))
    val invA = inv.select(col("id_b").as("id_a"), col("h"))
    // NO broadcast() anywhere below: this is the fully shuffled tier
    def countVerified(pairs: DataFrame): DataFrame =
      pairs.distinct()
        .join(invA, Seq("id_a"))
        .join(inv, Seq("id_b", "h"))
        .groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("__shared"))
        .join(sizesA, Seq("id_a"))
        .select(col("id_a"), col("id_b"),
          round(col("__shared").cast("double") /
            col("__n_a").cast("double"), 6).as("containment"))
        .where(col("containment") >= threshold)

    val shim = org.apache.spark.sql.GraftSqlShim
    // one batch: materialize (eager checkpoint), drop OWN shuffles
    // synchronously (lineage-derived ids — concurrency-safe on a
    // shared session by construction), count survivors
    def runBatch(i: Int): Long = {
      val (part, owned) = shim.eagerCheckpointWithShuffleIds(
        countVerified(
          cands.where(pmod(xxhash64(col("id_a")), lit(k)) === i)))
      shim.cleanupShuffles(spark, owned)
      val n = part.count()
      shim.unpersistCheckpoint(part)
      n
    }

    val scratchDir = new java.io.File(
      spark.conf.getOption("spark.local.dir")
        .orElse(sys.props.get("spark.local.dir"))
        .getOrElse(System.getProperty("java.io.tmpdir", "/tmp"))
        .split(",").head)
    def measured(phase: String)(body: => Seq[Long])
        : (Seq[Long], Double, Long) = {
      @volatile var minUsable = scratchDir.getUsableSpace
      @volatile var sampling = true
      val sampler = new Thread(() => {
        while (sampling) {
          minUsable = math.min(minUsable, scratchDir.getUsableSpace)
          Thread.sleep(250)
        }
      }, s"graft-scratch-$phase")
      sampler.setDaemon(true)
      val usable0 = scratchDir.getUsableSpace
      sampler.start()
      val t0 = System.nanoTime()
      val rows = body
      val wall = (System.nanoTime() - t0) / 1e9
      sampling = false
      (rows, wall, math.max(0L, usable0 - minUsable))
    }

    // warm the shared inputs once (checkpoint + parquet cache) so both
    // phases start from the same resident state
    sh.count()

    val (seqRows, seqWall, seqPeak) = measured("seq") {
      (0 until k).map(runBatch)
    }
    val pool = Executors.newFixedThreadPool(conc)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val (parRows, parWall, parPeak) = measured("par") {
      val fs = (0 until k).map(i => Future(runBatch(i)))
      Await.result(Future.sequence(fs), Duration.Inf)
    }
    pool.shutdown()

    require(seqRows.sum == parRows.sum,
      s"parallel batches disagree with sequential: " +
        s"${parRows.sum} vs ${seqRows.sum}")
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val point =
      s"""{"dir":"$dir","containment_batched_parallel":[${fmt(parWall)}],""" +
      s""""containment_batched_parallel_rows":${parRows.sum},""" +
      s""""containment_batched_parallel_k":$k,""" +
      s""""containment_batched_parallel_concurrency":$conc,""" +
      s""""containment_batched_parallel_peak_scratch":$parPeak,""" +
      s""""containment_batched_parallel_batch_rows":[${parRows.mkString(",")}],""" +
      s""""containment_batched_sequential":[${fmt(seqWall)}],""" +
      s""""containment_batched_sequential_rows":${seqRows.sum},""" +
      s""""containment_batched_sequential_peak_scratch":$seqPeak}"""
    val line = s"""{"metric":"scale_curve","points":[$point],""" +
      s""""loadavg_start":"$loadStart","loadavg_end":"$loadavg",""" +
      s""""cpus":"$cpus","xmx_gb":${Runtime.getRuntime.maxMemory / (1L << 30)}}"""
    println(line)
    val out = java.nio.file.Paths.get("target",
      "bench_containment_parallel.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
