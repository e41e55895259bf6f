package graft

import org.apache.spark.sql.functions._

/** Physical-layout plan contracts: write-time bucketing must make the
  * recurring equi-join exchange-free, and a dim-side filter must prune
  * fact partitions at RUNTIME (dynamic partition pruning) — the two
  * write-once layouts that convert 100-TB recurring costs (full
  * two-sided shuffles, full-history scans) into local merges and
  * single-directory reads. Both asserts are plan-shape, not results:
  * a regression would still return correct rows, just at shuffle/scan
  * cost — exactly what these tests exist to catch. */
class LayoutSpec extends SparkTestBase {

  private def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete()
      }
      rm(d)
    }
    d.getPath
  }

  test("bucketed tables join shuffle-free and match the flat join") {
    import spark.implicits._
    val left = (1 to 500).map(i => (i.toLong % 60, i % 37, s"o$i"))
      .toDF("k", "grp", "tag")
    val right = (1 to 120).map(i => (i.toLong, s"seg${i % 5}"))
      .toDF("ck", "seg")
    val base = tmpDir("graft_bkt_spec")
    left.write.mode("overwrite").option("path", s"$base/l")
      .bucketBy(4, "k").sortBy("k").saveAsTable("graft_spec_bkt_l")
    right.write.mode("overwrite").option("path", s"$base/r")
      .bucketBy(4, "ck").sortBy("ck").saveAsTable("graft_spec_bkt_r")
    try {
      val joined = spark.table("graft_spec_bkt_l").hint("merge")
        .join(spark.table("graft_spec_bkt_r"), col("k") === col("ck"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      val got = joined.select("k", "grp", "tag", "ck", "seg")
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
      val want = left.join(right, col("k") === col("ck"))
        .select("k", "grp", "tag", "ck", "seg")
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(got.toSeq == want.toSeq)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_spec_bkt_l")
      spark.sql("DROP TABLE IF EXISTS graft_spec_bkt_r")
    }
  }

  test("zorder2 matches a reference bit interleave on random pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def ref(a: Long, b: Long, bits: Int): Long = {
      var z = 0L
      for (i <- 0 until bits) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val pairs = Seq.fill(200)((rnd.nextInt(1024).toLong,
      rnd.nextInt(1024).toLong)) :+ ((0L, 0L)) :+ ((1023L, 1023L))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.operators.Layout.zorder2(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, z) =>
      assert(z == ref(a, b, 10), s"zorder2($a, $b)")
    }
  }

  test("dim-side filter dynamically prunes fact partitions") {
    import spark.implicits._
    val factPath = tmpDir("graft_dpp_fact")
    val dimPath = tmpDir("graft_dpp_dim")
    (0 until 2000).map(i => (i.toLong, i % 20, i * 1.5))
      .toDF("id", "day", "value")
      .write.mode("overwrite").partitionBy("day").parquet(factPath)
    (0 until 20).map(d => (d, s"d$d")).toDF("day", "label")
      .write.mode("overwrite").parquet(dimPath)
    val fact = spark.read.parquet(factPath)
    val dim = spark.read.parquet(dimPath).where(col("day") % 7 === 0)
    val out = fact.join(dim, "day")
      .groupBy("label").agg(count(lit(1)).as("n"))
    val plan = out.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("dynamicpruning"),
      s"fact scan must carry a runtime pruning filter:\n$plan")
    val got = out.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    // days 0, 7, 14 of the 0..19 ring over 2000 rows: 100 rows each
    assert(got.toSeq == Seq(("d0", 100L), ("d14", 100L), ("d7", 100L)))
  }
}
