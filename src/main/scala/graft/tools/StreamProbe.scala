package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc streaming-query profiler: runs the q79 stream-stream range
  * join shape and prints per-micro-batch progress (batch count, rows,
  * durationMs breakdown) — evidence for micro-batch fixed-cost work.
  * Not part of any gate. Usage: runMain graft.tools.StreamProbe <sfDir> */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.install(spark)
    val t0 = System.nanoTime()
    val l = graft.Tables.loadStream(spark, sfDir, "events")
      .where(col("event_type") === "click")
      .select(col("user_id").as("u"), col("ts").as("l_ts"),
        col("event_id").as("click_id"))
    val r = graft.Tables.loadStream(spark, sfDir, "events")
      .where(col("event_type") === "purchase")
      .select(col("user_id").as("u2"), col("ts").as("r_ts"),
        col("event_id").as("purchase_id"))
    val joined = graft.streaming.StreamingOps.streamStreamRangeJoin(
      l, r, "u", "u2", "l_ts", "r_ts",
      tolerance = "4 hours", watermark = "3650 days")
    val q = joined.select(col("u"), col("click_id"), col("purchase_id"))
      .writeStream.format("memory").queryName("probe_mem")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9
    println(String.format(java.util.Locale.ROOT,
      "STREAMPROBE total=%.2fs batches=%d", Double.box(sec),
      Int.box(q.recentProgress.length)))
    q.recentProgress.foreach { p =>
      println(s"BATCH id=${p.batchId} rows=${p.numInputRows} " +
        s"durations=${p.durationMs} state=${p.stateOperators.map(s =>
          s"rows=${s.numRowsTotal} mem=${s.memoryUsedBytes}").mkString(";")}")
    }
    spark.stop()
  }
}
