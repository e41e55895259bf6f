package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway baseline: what does ONE 2.5M-row shuffle+agg cost in this
  * harness? Calibrates the star-loop per-stage numbers. */
object ShufBase {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = spark.range(2500000L)
        .select((col("id") % 1000000L).as("k"))
        .repartition(32, col("k"))
        .groupBy("k").count()
        .where(col("count") > 1).count()
      println(f"SHUF run=$i n=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      val t1 = System.nanoTime()
      val df = spark.range(2500000L)
        .select((col("id") % 1000000L).as("k"), (col("id") * 7L).as("v"))
      val j = df.as("a").join(df.as("b"), "k").groupBy()
        .agg(count(lit(1))).head().getLong(0)
      println(f"JOIN run=$i n=$j sec=${(System.nanoTime() - t1) / 1e9}%.2f")
    }
    spark.stop()
  }
}
