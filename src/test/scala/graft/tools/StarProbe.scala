package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary probe: per-round wall of the star loop on the 2.5M scrambled
  * graph (same construction as Bench.ccLoopFlagship). Not committed. */
object StarProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("INFO")
    org.apache.log4j.LogManager.getLogger("org.apache.spark")
      .setLevel(org.apache.log4j.Level.WARN)
    org.apache.log4j.LogManager.getLogger("graft")
      .setLevel(org.apache.log4j.Level.INFO)
    graft.GraftSession.install(spark)
    graft.Tables.registerAll(spark, sfDir)
    val J = 64
    val pairs = graft.Tables.load(spark, sfDir, "events")
      .select(col("event_id").cast("long").as("e"))
      .where(col("e") < 20000)
      .select(col("e"), explode(sequence(lit(1), lit(J - 1))).as("j"))
      .select((col("e") * J + col("j") - 1).as("a"),
        (col("e") * J + col("j")).as("b"))
      .select(xxhash64(col("a")).as("id1"), xxhash64(col("b")).as("id2"))
    for (i <- 1 to (if (args.length > 1) args(1).toInt else 2)) {
      val t0 = System.nanoTime()
      val n = graft.operators.Dedup.connectedComponents(pairs,
        maxIterations = 30).count()
      println(f"RUN $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
        s"$n labels, engine=${graft.operators.Dedup.lastEngine}, " +
        s"rounds=${graft.operators.Dedup.lastIterations}")
    }
    spark.stop()
  }
}
