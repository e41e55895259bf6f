package graft

import graft.operators.BinnedIntervalJoin

import org.apache.spark.sql.DataFrame

/** Binned (skew-proof) overlap join ≡ the plain overlap join, including
  * intervals spanning many bins and hot keys. */
class BinnedIntervalJoinSpec extends SparkTestBase {

  import spark.implicits._

  private def randomTable(seed: Int, n: Int, hot: Boolean): DataFrame = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val contig = if (hot && i % 10 != 0) "chrHOT" else s"chr${rnd.nextInt(3)}"
      val s = rnd.nextInt(5000)
      (contig, s, s + rnd.nextInt(800)) // spans up to 9 bins at binSize=100
    }.toDF("contig", "pos_start", "pos_end")
  }

  private def plainJoin(a: DataFrame, b: DataFrame, withKey: Boolean): Set[Seq[Any]] = {
    val al = a.select($"contig".as("ac"), $"pos_start".as("as_"), $"pos_end".as("ae"))
    val bl = b.select($"contig".as("bc"), $"pos_start".as("bs"), $"pos_end".as("be"))
    val range = $"as_" <= $"be" && $"ae" >= $"bs"
    al.join(bl, if (withKey) $"ac" === $"bc" && range else range)
      .collect().map(_.toSeq).toSet
  }

  private def binnedJoin(a: DataFrame, b: DataFrame, keys: Seq[String],
      binSize: Int): Set[Seq[Any]] = {
    val al = a.select($"contig".as("ac"), $"pos_start".as("as_"), $"pos_end".as("ae"))
    val bl = b.select($"contig".as("bc"), $"pos_start".as("bs"), $"pos_end".as("be"))
    // rename-free variant: binned join with keys expressed on both sides
    val df = BinnedIntervalJoin.join(
      al.withColumnRenamed("ac", "k"), bl.withColumnRenamed("bc", "k"),
      if (keys.nonEmpty) Seq("k") else Nil, "as_", "ae", "bs", "be", binSize)
    df.collect().map(_.toSeq).toSet
  }

  test("binned ≡ plain on hot-key data, partitioned mode, binSize=100") {
    spark.conf.set(GraftSession.IntervalJoinForceMode, "partitioned")
    try {
      val a = randomTable(1, 500, hot = true).cache()
      val b = randomTable(2, 500, hot = true).cache()
      a.count(); b.count()
      val exp = plainJoin(a, b, withKey = true)
        .map { r => Seq(r(0), r(1), r(2), r(3), r(4), r(5)) }
      val got = binnedJoin(a, b, Seq("contig"), 100)
      // binned output: k, as_, ae, k, bs, be — same values
      assert(got.size == exp.size)
      assert(got == exp)
      a.unpersist(); b.unpersist()
    } finally spark.conf.set(GraftSession.IntervalJoinForceMode, "")
  }

  test("binned ≡ plain keyless, spanning bins, binSize=64") {
    val a = randomTable(3, 200, hot = false).drop("contig")
      .toDF("pos_start", "pos_end").cache()
    val b = randomTable(4, 200, hot = false).drop("contig")
      .toDF("pos_start", "pos_end").cache()
    a.count(); b.count()
    val al = a.select($"pos_start".as("as_"), $"pos_end".as("ae"))
    val bl = b.select($"pos_start".as("bs"), $"pos_end".as("be"))
    val exp = al.join(bl, $"as_" <= $"be" && $"ae" >= $"bs")
      .collect().map(_.toSeq).toSet
    val got = BinnedIntervalJoin.join(al, bl, Nil, "as_", "ae", "bs", "be", 64)
      .collect().map(_.toSeq).toSet
    assert(got == exp)
    a.unpersist(); b.unpersist()
  }

  test("binned join plans through IntervalJoinExec with bin equi-key") {
    val a = Seq(("c1", 1, 250)).toDF("k", "s", "e")
    val b = Seq(("c1", 200, 260)).toDF("k", "s2", "e2")
    val df = BinnedIntervalJoin.join(a, b, Seq("k"), "s", "e", "s2", "e2", 100)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("IntervalJoinExec"), plan)
    assert(df.count() == 1) // pair overlaps in bin 2 only once
  }
}
