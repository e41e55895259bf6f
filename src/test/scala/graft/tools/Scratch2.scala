package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val a = Seq(("c1", 1, 5), ("c1", 3, 9), ("c2", 1, 4)).toDF("contig", "pos_start", "pos_end")
    val b = Seq(("c1", 4, 6), ("c2", 10, 12)).toDF("contig", "pos_start", "pos_end")
    val al = a.select($"contig".as("ac"), $"pos_start".as("as_"), $"pos_end".as("ae"))
    val bl = b.select($"contig".as("bc"), $"pos_start".as("bs"), $"pos_end".as("be"))
    val cond = $"ac" === $"bc" && $"as_" <= $"be" && $"ae" >= $"bs"
    val df = al.join(bl, cond)
    println("=== PHYSICAL ===")
    println(df.queryExecution.executedPlan.treeString)
    df.collect().foreach(r => println("ROW " + r))
    // grouped agg on top fuses into the same stage
    val agg = al.join(bl, cond).groupBy($"bs").agg(max($"ae").as("m"))
    agg.collect().foreach(r => println("AGG " + r))
    spark.stop()
  }
}
