package graft.tools

import graft.GraftSession
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Throwaway perf diagnosis harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text").cache()
    docs.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (n=$n)")
    }
    time("shingles")(docs.select(Dedup.wordShingles(col("text")).as("sh"))
      .agg(sum(size(col("sh")))).head().getLong(0))
    time("signature h=64")(docs.select(
      Dedup.minhashSignature(Dedup.wordShingles(col("text")), 64).as("sig"))
      .agg(sum(size(col("sig")))).head().getLong(0))
    time("lshCandidatePairs")(
      Dedup.lshCandidatePairs(docs, "doc_id", "text").count())
    time("minhashDupPairs")(
      Dedup.minhashDupPairs(docs, "doc_id", "text", 0.8).count())
    spark.stop()
  }
}
