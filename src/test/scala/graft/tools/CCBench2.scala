package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Throwaway: phase-by-phase timing of a COLD q56 (fresh JVM), with the
  * LSH warmed the way the driver's Bench does (q21/q23 run first). */
object CCBench2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    graft.Tables.registerAll(spark, dir)
    graft.Tables.names.foreach(n => graft.Tables.load(spark, dir, n).count())
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val docs = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "text")
    val corpus = docs
      .union(docs.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      .union(docs.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 2000000).as("doc_id"),
          concat(col("text"), lit(" graft dup marker")).as("text")))
    // warm like the driver: q21-ish + q23-ish run before q56
    time("warm q23 (minhashDupPairs)") {
      Dedup.minhashDupPairs(corpus, "doc_id", "text", threshold = 0.8).count()
    }
    // now the cold q56 path, phase by phase
    val pairs = Dedup.minhashDupPairs(corpus, "doc_id", "text",
      threshold = 0.8).select(col("id1"), col("id2"))
    val e = pairs.where(col("id1").isNotNull && col("id2").isNotNull)
      .select(col("id1").as("src"), col("id2").as("dst"))
    val half = time("half checkpoint")(e.localCheckpoint())
    val edges = time("edges repart checkpoint") {
      Dedup.checkpointPartitionedBy(
        half.union(half.select(col("dst"), col("src"))), "src")
    }
    var labels = time("labels init") {
      edges.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("lbl")).localCheckpoint()
    }
    val lblType = labels.schema("lbl").dataType
    var changed = 1L
    var it = 0
    while (changed > 0 && it < 50) {
      val t0 = System.nanoTime()
      val msgs = edges.join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("lbl"),
          lit(null).cast(lblType).as("prev"))
      val own = labels.select(col("id"), col("lbl"), col("lbl").as("prev"))
      val next = own.union(msgs)
        .groupBy("id").agg(min("lbl").as("lbl"), min("prev").as("prev"))
        .localCheckpoint()
      val tCkpt = (System.nanoTime() - t0) / 1e9
      changed = next.where(col("lbl") < col("prev")).count()
      labels = next.select("id", "lbl")
      println(f"round $it: ckpt $tCkpt%5.2f s, count ${(System.nanoTime() - t0) / 1e9 - tCkpt}%5.2f s, changed=$changed")
      it += 1
    }
    spark.stop()
  }
}
