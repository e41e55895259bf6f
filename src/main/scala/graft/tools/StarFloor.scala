package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Floor measurement for the cc_star ≤ 9 s target (r15 verdict next-#1
  * option b): decomposes what an alternating-star ROUND on the
  * 1.26 M-edge bench graph must pay even with zero algorithmic waste,
  * on THIS box.
  *
  * Context the floor rests on (measured r16, committed alongside):
  * widening the round partitions (7 → 12/16/32) is neutral-to-worse,
  * and a node-frame broadcast tier that removed TWO of the three
  * edge-sized exchanges per round measured IDENTICAL warm walls in
  * interleaved A/B — the exchanges are ~free at 20 MB/round; round
  * wall is the serial stage-barrier chain plus the window sort. So the
  * floor is: (stages per round) × (per-stage barrier cost) + (the two
  * unavoidable data passes: the hash(hi) window-sort over the edge
  * rows and the relabel exchange + dedup/min aggregates).
  *
  * Measures, each on the exact bench row volume (1.26 M canonical
  * rows, 7 round partitions, AQE off — the loop's own config):
  *   1. `barrier`: a 6-stage chain of trivial exchanges over 7 rows,
  *      repeated — pure scheduling/barrier cost per stage.
  *   2. `round_min`: the round's data plumbing with the large-star
  *      join REMOVED (window min over hi + relabel repartition +
  *      dropDuplicates + min/count aggregate to one row) — a strict
  *      LOWER bound on a real round, which additionally joins the
  *      min-frame into every edge row.
  *   3. `round_real`: one real round's median from the live loop
  *      (read from Dedup.lastStarRounds after a full run).
  * Prints one JSON line; merge into SCALE via assemble_scale.py.
  *
  * Usage: runMain graft.tools.StarFloor [sfDir] [reps]
  */
object StarFloor {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.install(spark)
    def loadavg: String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split("\\s+").take(3).mkString(",")
      catch { case _: Exception => "" }
    val loadStart = loadavg
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    // the exact bench graph, canonicalized like starLoop round 0
    val J = 64
    val c0 = graft.Tables.load(spark, dir, "events")
      .select(col("event_id").cast("long").as("e"))
      .where(col("e") < 20000)
      .select(col("e"), explode(sequence(lit(1), lit(J - 1))).as("j"))
      .select(xxhash64(col("e") * J + col("j") - 1).as("a"),
        xxhash64(col("e") * J + col("j")).as("b"))
      .select(greatest(col("a"), col("b")).as("hi"),
        least(col("a"), col("b")).as("lo"))
      .repartition(7, col("hi"))
      .localCheckpoint()
    val edgeRows = c0.count()
    val aqeKey = "spark.sql.adaptive.enabled"
    spark.conf.set(aqeKey, "false")
    spark.conf.set("spark.sql.shuffle.partitions", "7")

    // 1. pure barrier chain: 6 dependent exchanges over 7 near-empty
    // rows — measures scheduling + stage-commit cost with ~zero data
    val tiny = spark.range(7).select(col("id").as("k"), lit(1L).as("v"))
      .repartition(7, col("k")).localCheckpoint()
    tiny.count()
    def barrierChain(): Unit = {
      var f = tiny
      for (i <- 1 to 6)
        f = f.repartition(7, expr(s"k + $i")).toDF("k", "v")
      f.groupBy().count().head()
    }
    barrierChain() // warm codegen
    val barrierSecs = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); barrierChain()
      (System.nanoTime() - t0) / 1e9
    }

    // 2. round lower bound: window min + relabel + dedup + stats, NO
    // large-star join (a real round does strictly more)
    def roundMin(): Unit = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("hi")
      c0.withColumn("m2", min("lo").over(w))
        .select(when(col("lo") === col("m2"), col("hi"))
          .otherwise(col("lo")).as("hi"), col("m2").as("lo"))
        .repartition(7, col("hi"))
        .dropDuplicates("hi", "lo")
        .groupBy("hi").agg(min("lo").as("p"), count(lit(1)).as("deg"))
        .agg(sum(when(col("deg") > 1, 1L).otherwise(0L)),
          sum("deg")).head()
    }
    roundMin() // warm
    val roundMinSecs = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); roundMin()
      (System.nanoTime() - t0) / 1e9
    }
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set(aqeKey, "true")

    // 3. the live loop's own per-round walls + total (median of reps)
    val pairs = graft.Tables.load(spark, dir, "events")
      .select(col("event_id").cast("long").as("e"))
      .where(col("e") < 20000)
      .select(col("e"), explode(sequence(lit(1), lit(J - 1))).as("j"))
      .select((col("e") * J + col("j") - 1).as("a"),
        (col("e") * J + col("j")).as("b"))
      .select(xxhash64(col("a")).as("id1"), xxhash64(col("b")).as("id2"))
    val totals = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      graft.operators.Dedup.connectedComponents(pairs, maxIterations = 30)
        .count()
      (System.nanoTime() - t0) / 1e9
    }
    val lastRounds = graft.operators.Dedup.lastStarRounds.map(_._2)
    val rounds = lastRounds.size

    val floor = 6.0 * med(roundMinSecs)
    val line = s"""{"metric":"star_floor","dir":"$dir","edge_rows":$edgeRows,""" +
      s""""barrier_chain6":[${barrierSecs.map(fmt).mkString(",")}],""" +
      s""""round_min":[${roundMinSecs.map(fmt).mkString(",")}],""" +
      s""""cc_total":[${totals.map(fmt).mkString(",")}],""" +
      s""""last_round_walls":[${lastRounds.map(fmt).mkString(",")}],""" +
      s""""rounds":$rounds,""" +
      s""""floor_6x_round_min":${fmt(floor)},""" +
      s""""loadavg_start":"$loadStart","loadavg_end":"$loadavg"}"""
    println(line)
    val out = java.nio.file.Paths.get("target", "star_floor.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
