package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc A/B harness for the star-CC bench entry: builds the exact
  * cc_star_2m5_scrambled graph (20 k chains of 64 nodes, xxhash64 ids)
  * and times N runs of [[graft.operators.Dedup.connectedComponents]].
  * Not part of the graded bench — exists so round-partitioning and
  * conf-pin experiments measure the real entry instead of proxies.
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val nStar = if (args.length > 2) args(2).toInt else 0
    val relKey = if (args.length > 3) args(3) else ""
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.install(spark)
    if (nStar > 0) spark.conf.set(
      graft.operators.Dedup.StarPartitionsConf, nStar.toString)
    if (relKey.nonEmpty) spark.conf.set(
      graft.operators.Dedup.StarRelabelKeyConf, relKey)
    val J = 64
    val pairs = graft.Tables.load(spark, dir, "events")
      .select(col("event_id").cast("long").as("e"))
      .where(col("e") < 20000)
      .select(col("e"), explode(sequence(lit(1), lit(J - 1))).as("j"))
      .select((col("e") * J + col("j") - 1).as("a"),
        (col("e") * J + col("j")).as("b"))
      .select(xxhash64(col("a")).as("id1"), xxhash64(col("b")).as("id2"))
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = graft.operators.Dedup
        .connectedComponents(pairs, maxIterations = 30).count()
      val w = (System.nanoTime() - t0) / 1e9
      println(f"CCBENCH rep=$r nodes=$n rounds=${graft.operators.Dedup.lastIterations} wall=$w%.3f")
      graft.operators.Dedup.lastStarRounds.zipWithIndex.foreach {
        case ((e, s), i) => println(f"CCBENCH   round=${i + 1} edges=$e wall=$s%.3f")
      }
    }
    spark.stop()
  }
}
