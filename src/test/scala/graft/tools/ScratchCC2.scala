package graft.tools

import org.apache.spark.sql.SparkSession

/** Reproduce the DedupGroupsSpec stall-guard scenario in isolation with
  * round logging visible. */
object ScratchCC2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "graft.Dedup", org.apache.logging.log4j.Level.INFO)
    graft.GraftSession.install(spark)
    import spark.implicits._
    val n = 2000
    val pairs = (0 until n).map(i => (i.toLong, ((i * 7919) % n).toLong))
      .filter { case (a, b) => a != b }
    val t0 = System.nanoTime()
    val labels = graft.operators.Dedup.connectedComponents(
        pairs.toDF("id1", "id2"), microGraphMaxEdges = 100L)
      .collect()
    println(f"SCRATCH2 rows=${labels.length} sec=${(System.nanoTime() - t0) / 1e9}%.2f " +
      s"iters=${graft.operators.Dedup.lastIterations} forest=${graft.operators.Dedup.lastForestEdges}")
    spark.stop()
  }
}
