package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Throwaway: print the physical plan of one CC round's edges-labels
  * join to see whether the edge side gets sorted per round. */
object CCPlan {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val pairs = (1L to 5000L).map(i => (i, i + 1)).toDF("id1", "id2")
    val e = pairs.select(col("id1").as("src"), col("id2").as("dst"))
    val half = e.localCheckpoint()
    val edges = Dedup.checkpointPartitionedBy(
      half.union(half.select(col("dst"), col("src"))), "src")
    val labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lbl")).localCheckpoint()
    val msgs = edges.join(labels, edges("src") === labels("id"))
      .select(col("dst").as("id"), col("lbl"))
    println("=== plain join ===")
    println(msgs.queryExecution.executedPlan.treeString)
    val msgsH = edges.join(labels.hint("shuffle_hash"),
        edges("src") === labels("id"))
      .select(col("dst").as("id"), col("lbl"))
    println("=== labels shuffle_hash hint ===")
    println(msgsH.queryExecution.executedPlan.treeString)
    spark.stop()
  }
}
