package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Throwaway perf harness: reference-scale interval join (~100M output
  * pairs) with custom join vs stock Spark, broadcast vs partitioned. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(sys.env.getOrElse("SCRATCH_MASTER", "local[32]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.1", "events")
      .select("event_id", "user_id")
    def tbl(mult: Int, width: Int) = ev.select(
      (col("user_id") % 20).cast("int").as("contig"),
      ((col("event_id") * mult) % 100000).cast("int").as("pos_start"),
      ((col("event_id") * mult) % 100000 + col("event_id") % width * 20)
        .cast("int").as("pos_end"))
    // one parquet split -> repartition for real probe-side parallelism
    // (SCRATCH_PARTS=1 for single-task per-core measurements)
    val parts = sys.env.getOrElse("SCRATCH_PARTS", "32").toInt
    val a = tbl(37, 1000).repartition(parts).cache()
    val b = tbl(53, 700).repartition(parts).cache()
    a.count(); b.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }
    val cond = a("contig") === b("contig") &&
      a("pos_start") <= b("pos_end") && a("pos_end") >= b("pos_start")
    spark.conf.set(GraftSession.PreferIntervalJoin, "true")
    spark.conf.set(GraftSession.IntervalJoinForceMode, "")
    time("graft broadcast, 32 cores")(a.join(b, cond).count())
    time("graft broadcast, run 2")(a.join(b, cond).count())
    spark.conf.set(GraftSession.IntervalJoinForceMode, "partitioned")
    time("graft partitioned, 32 cores")(a.join(b, cond).count())
    spark.conf.set(GraftSession.IntervalJoinForceMode, "")
    println("count plan: " + a.join(b, cond).groupBy().count()
      .queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("IntervalCount") || l.contains("IntervalJoin"))
      .mkString(" | "))
    time("graft count-pushdown")(a.join(b, cond).count())
    time("graft count-pushdown, run 2")(a.join(b, cond).count())
    spark.conf.set(GraftSession.PreferIntervalJoin, "true")
    // pair-materializing path (sum is not rewritten to the count operator)
    def sumQ() = { a.join(b, cond).agg(sum(b("pos_start"))).head().getLong(0) }
    time("graft join+sum (codegen)")(sumQ())
    time("graft join+sum run 2")(sumQ())
    spark.conf.set(GraftSession.IntervalJoinForceMode, "partitioned")
    time("graft join+sum partitioned")(sumQ())
    spark.conf.set(GraftSession.IntervalJoinForceMode, "")
    spark.conf.set(GraftSession.PreferIntervalJoin, "false")
    time("stock spark join+sum")(sumQ())
    spark.stop()
  }
}
