package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Throwaway perf harness: q56 (LSH pairs -> connectedComponents) wall
  * time split into pair generation vs the CC loop, at sf0.1. */
object CCBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    graft.Tables.registerAll(spark, dir)
    graft.Tables.names.foreach(n => graft.Tables.load(spark, dir, n).count())
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    for (run <- 1 to 3) {
      println(s"--- run $run")
      val q56 = time("q56 end-to-end") {
        graft.SparkEntry.queries("q56_dedup_groups")(spark, dir).count()
      }
      println(s"    rows=$q56")
      // same near corpus as SparkEntry.dupCorpus(near = true)
      val docs = graft.Tables.load(spark, dir, "documents")
        .select("doc_id", "text")
      val corpus = docs
        .union(docs.where(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
        .union(docs.where(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 2000000).as("doc_id"),
            concat(col("text"), lit(" graft dup marker")).as("text")))
      val pairs = time("pairs only") {
        val p = Dedup.minhashDupPairs(corpus, "doc_id", "text", threshold = 0.8)
          .select(col("id1"), col("id2")).localCheckpoint()
        p.count(); p
      }
      time("cc on materialized pairs") {
        Dedup.connectedComponents(pairs).count()
      }
    }
    spark.stop()
  }
}
