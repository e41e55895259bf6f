package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc timing of the distributed connectedComponents path on the
  * q69 graph (2.5M symmetric edges at sf0.1) — since the contraction
  * pre-pass landed this is contraction + micro resolve; see ScratchCC3
  * for the scrambled-id star path. Raises the graft.Dedup logger to
  * INFO so the engine/round lines print with log4j timestamps.
  */
object ScratchCC {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "graft.Dedup", org.apache.logging.log4j.Level.INFO)
    graft.GraftSession.install(spark)
    graft.Tables.registerAll(spark, sfDir)
    graft.Tables.load(spark, sfDir, "events").count()
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries("q69_dedup_groups_large")(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"SCRATCHCC run=$i rows=$rows sec=$sec%.3f iters=${graft.operators.Dedup.lastIterations}")
    }
    spark.stop()
  }
}
