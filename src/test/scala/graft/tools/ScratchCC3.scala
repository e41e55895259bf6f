package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Smoke the two at-scale connectedComponents paths on the q69 graph
  * (2.5 M symmetric edges at sf0.1): default (contraction + micro) and
  * scrambled-id (stall guard → alternating-star rounds), with round
  * logging.
  */
object ScratchCC3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    val J = 64
    def pairs(scramble: Boolean) = {
      val p = graft.Tables.load(spark, sfDir, "events")
        .select(col("event_id").cast("long").as("e"))
        .where(col("e") < 20000)
        .select(col("e"), explode(sequence(lit(1), lit(J - 1))).as("j"))
        .select((col("e") * J + col("j") - 1).as("id1"),
          (col("e") * J + col("j")).as("id2"))
      if (!scramble) p
      else p.select(xxhash64(col("id1")).as("id1"),
        xxhash64(col("id2")).as("id2"))
    }
    for (scramble <- Seq(false, true); i <- 1 to 2) {
      val t0 = System.nanoTime()
      val rows = graft.operators.Dedup
        .connectedComponents(pairs(scramble), maxIterations = 30).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"SCRATCHCC3 scramble=$scramble run=$i rows=$rows " +
        f"sec=$sec%.3f iters=${graft.operators.Dedup.lastIterations} " +
        s"forest=${graft.operators.Dedup.lastForestEdges}")
    }
    spark.stop()
  }
}
