package graft.tools

import graft.GraftSession
import graft.operators.NearestJoin
import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

/** Throwaway surface-drive harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 1. nearest-join public API end-to-end, plan + rows
    val a = Seq(("chr1", 100, 200), ("chr1", 500, 600)).toDF("contig", "s", "e")
    val b = Seq(("chr1", 250, 260), ("chr1", 90, 110), ("chr2", 1, 2))
      .toDF("contig", "s", "e")
    val nj = NearestJoin(
      a.select($"contig".as("ac"), $"s".as("as_"), $"e".as("ae")),
      b.select($"contig".as("bc"), $"s".as("bs"), $"e".as("be")),
      $"ac" === $"bc" && $"as_" <= $"be" && $"ae" >= $"bs")
    println("PLAN-HAS-INTERVALJOIN=" +
      nj.queryExecution.executedPlan.toString.contains("IntervalJoinExec"))
    nj.collect().foreach(r => println("NJ-ROW " + r))

    // 2. streaming dedup through the public operator, driven by a memory
    // stream source
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    input.addData((1L, Timestamp.valueOf("2026-01-01 10:00:00"), 1.0),
      (1L, Timestamp.valueOf("2026-01-01 10:01:00"), 2.0),
      (2L, Timestamp.valueOf("2026-01-01 10:02:00"), 3.0))
    val q = StreamingOps.dedupStream(
        input.toDF().toDF("event_id", "ts", "value"), "event_id", "ts")
      .writeStream.format("memory").queryName("scr_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    spark.table("scr_out").collect().foreach(r => println("STREAM-ROW " + r))
    spark.stop()
  }
}
