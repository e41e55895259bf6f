package graft.tools

import org.apache.spark.sql.SparkSession

/** Assert which CC engine q70 routes through (must be the star path). */
object ScratchQ70 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.install(spark)
    val rows = graft.SparkEntry.queries("q70_dedup_groups_star")(spark, sfDir).count()
    println(s"SCRATCHQ70 rows=$rows engine=${graft.operators.Dedup.lastEngine} " +
      s"iters=${graft.operators.Dedup.lastIterations} " +
      s"forest=${graft.operators.Dedup.lastForestEdges}")
    spark.stop()
  }
}
