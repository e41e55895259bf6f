package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc star-engine round profiler: runs the q77-shaped scrambled
  * chain graph through [[graft.operators.Dedup.connectedComponents]]
  * and prints the per-round (edges, wall) stats the loop records —
  * the evidence feed for round-cost work. Not part of any gate.
  *
  * Usage: runMain graft.tools.StarProbe <sfDir> [reps]
  */
object StarProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("STARPROBE_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val i = sc.stageInfo
          val wall = (for {
            s <- i.submissionTime; c <- i.completionTime
          } yield (c - s) / 1e3).getOrElse(-1.0)
          val m = i.taskMetrics
          println(String.format(java.util.Locale.ROOT,
            "STAGE id=%d tasks=%d wall=%.2fs run=%.2fs cpu=%.2fs " +
              "gc=%.2fs deser=%.2fs shw=%.2fs shrWait=%.2fs name=%s",
            Int.box(i.stageId), Int.box(i.numTasks), Double.box(wall),
            Double.box(m.executorRunTime / 1e3),
            Double.box(m.executorCpuTime / 1e9),
            Double.box(m.jvmGCTime / 1e3),
            Double.box(m.executorDeserializeTime / 1e3),
            Double.box(m.shuffleWriteMetrics.writeTime / 1e9),
            Double.box(m.shuffleReadMetrics.fetchWaitTime / 1e3),
            i.name.take(60)))
        }
      })
    graft.GraftSession.install(spark)
    val J = 64
    val pairs = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id").cast("long").as("e"))
      .where(col("e") < 20000)
      .select(col("e"), explode(sequence(lit(1), lit(J - 1))).as("j"))
      .select((col("e") * J + col("j") - 1).as("a"),
        (col("e") * J + col("j")).as("b"))
      .select(xxhash64(col("a")).as("id1"), xxhash64(col("b")).as("id2"))
    if (sys.env.contains("STARPROBE_EXPLAIN")) {
      val shim = org.apache.spark.sql.GraftSqlShim
      val e = pairs.select(col("id1").as("src"), col("id2").as("dst"))
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val (edges, _) = shim.checkpointHashPartitionedCounted(sym, "src")
      val c = shim.lazyCheckpointNoStats(
        edges.where(col("src") > col("dst"))
          .select(col("src").as("hi"), col("dst").as("lo")).distinct())
      val mn = c.groupBy("hi").agg(min("lo").as("m"))
        .select(col("hi").as("u"), col("m"))
      val large = c.join(mn, c("lo") === mn("u"), "left")
        .select(c("hi"), coalesce(mn("m"), c("lo")).as("lo"))
      val mn2 = large.groupBy("hi").agg(min("lo").as("m2"))
      val next = large.join(mn2, "hi")
        .where(col("lo") =!= col("m2"))
        .select(col("lo").as("hi"), col("m2").as("lo"))
        .union(mn2.select(col("hi"), col("m2").as("lo")))
        .distinct()
      val t0 = System.nanoTime()
      println("ROUND1 count=" + next.count() +
        " sec=" + (System.nanoTime() - t0) / 1e9)
      next.explain("formatted")
      spark.stop(); return
    }
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = graft.operators.Dedup
        .connectedComponents(pairs, maxIterations = 30).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(String.format(java.util.Locale.ROOT,
        "STARPROBE run=%d rows=%d total=%.2f s engine=%s rounds=%s",
        Int.box(i), Long.box(n), Double.box(sec),
        graft.operators.Dedup.lastEngine,
        graft.operators.Dedup.lastStarRounds.map { case (e, w) =>
          String.format(java.util.Locale.ROOT, "%d@%.2fs",
            Long.box(e), Double.box(w))
        }.mkString("[", ", ", "]")))
    }
    spark.stop()
  }
}
