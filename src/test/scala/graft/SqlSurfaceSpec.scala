package graft

import org.apache.spark.sql.functions._

/** Smoke tests of the inherited SQL surface the reference exposes through
  * its CLI (SURVEY §2b): catalog, SET, EXPLAIN — plus a skew test
  * documenting the broadcast-mode answer to hot keys. */
class SqlSurfaceSpec extends SparkTestBase {

  import spark.implicits._

  test("catalog: temp views are listable and queryable") {
    Seq((1, "x")).toDF("id", "v").createOrReplaceTempView("surface_t1")
    val tables = spark.sql("SHOW TABLES").collect().map(_.getString(1))
    assert(tables.contains("surface_t1"))
    assert(spark.sql("SELECT count(*) FROM surface_t1").head().getLong(0) == 1)
  }

  test("SET statements drive the graft confs") {
    spark.sql(s"SET ${GraftSession.PreferIntervalJoin}=false")
    assert(spark.conf.get(GraftSession.PreferIntervalJoin) == "false")
    spark.sql(s"SET ${GraftSession.PreferIntervalJoin}=true")
    assert(spark.conf.get(GraftSession.PreferIntervalJoin) == "true")
  }

  test("EXPLAIN surfaces the custom operator") {
    Seq(("c1", 1, 5)).toDF("contig", "pos_start", "pos_end")
      .createOrReplaceTempView("surface_a")
    Seq(("c1", 2, 3)).toDF("contig", "pos_start", "pos_end")
      .createOrReplaceTempView("surface_b")
    val explain = spark.sql(
      """EXPLAIN SELECT * FROM surface_a a JOIN surface_b b
        |ON a.contig = b.contig AND a.pos_start <= b.pos_end
        |AND a.pos_end >= b.pos_start""".stripMargin)
      .head().getString(0)
    assert(explain.contains("IntervalJoinExec"), explain)
  }

  test("compiled kernels are reachable as SQL functions") {
    GraftSession.install(spark)
    // shingle/simhash/minhash agree with the Scala column API
    val viaSql = spark.sql(
      """SELECT simhash64(shingle_hashes('the quick brown fox jumps')) AS sh,
        |       size(minhash_signature(
        |         shingle_hashes('the quick brown fox jumps'), 16)) AS n
        |""".stripMargin).head()
    val viaApi = Seq("the quick brown fox jumps").toDF("t")
      .select(
        org.apache.spark.sql.GraftSqlShim.column(graft.functions.SimHash64(
          graft.functions.ShingleHashes(
            org.apache.spark.sql.GraftSqlShim.lazyExpression($"t"), 3))))
      .head()
    assert(viaSql.getLong(0) == viaApi.getLong(0))
    assert(viaSql.getInt(1) == 16)
    val srp = spark.sql(
      "SELECT srp_bucket(array(CAST(1.0 AS FLOAT), CAST(-1.0 AS FLOAT)), 4, 2)")
      .head().getLong(0)
    assert(srp >= 0 && srp < 16)
    val tp = spark.sql("SELECT text_profile('Hello world 123!')").head()
    assert(!tp.isNullAt(0))
    // SQL array literals are array<double> — the builder coerces them so
    // ad-hoc probes need no manual CAST to array<float>
    val cos = spark.sql(
      "SELECT cosine_similarity(array(1.0, 0.0), array(1.0, 0.0))")
      .head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-9)
    // quantized dot: exact integer, builder coerces double literals
    val qd = spark.sql(
      "SELECT quantized_dot(array(1.5, -2.5), array(1.0, 1.0))")
      .head().getLong(0)
    assert(qd == 15000L * 10000 + -25000L * 10000)
    // the custom AGGREGATE resolves in SQL (analyzer wraps it)
    val qs = spark.sql(
      """SELECT quantized_vec_sum(v) FROM VALUES
        |  (array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))),
        |  (array(CAST(0.5 AS FLOAT), CAST(-1.0 AS FLOAT))) AS t(v)
        |""".stripMargin).head().getSeq[Long](0)
    assert(qs == Seq(15000L, 10000L))
  }

  test("Verify fails loud: a throwing query leaves an explicit error frame") {
    val out = java.nio.file.Files.createTempDirectory("graft_verify_fl").toString
    // construction-time throw (the round-10 silent-shrink shape)
    val boom = Verify.dumpOne(spark, "q_boom",
      (_, _) => throw new IllegalStateException("synthetic failure"), "", out)
    assert(boom.exists(_.contains("synthetic failure")))
    val frame = spark.read.parquet(s"$out/q_boom")
    assert(frame.columns.toSeq == Seq("graft_verify_error"))
    assert(frame.head().getString(0).contains("synthetic failure"))
    // execution-time throw (bad plan) also lands in the slot
    val exec = Verify.dumpOne(spark, "q_exec",
      (s, _) => { import s.implicits._
        Seq(1L).toDF("x").selectExpr("assert_true(x > 1)", "x") }, "", out)
    assert(exec.isDefined)
    assert(spark.read.parquet(s"$out/q_exec").columns.toSeq ==
      Seq("graft_verify_error"))
    // a healthy query returns None and writes its rows
    val ok = Verify.dumpOne(spark, "q_ok",
      (s, _) => { import s.implicits._; Seq((1L, "a")).toDF("id", "v") }, "", out)
    assert(ok.isEmpty)
    assert(spark.read.parquet(s"$out/q_ok").count() == 1L)
  }

  test("heavy key skew: broadcast mode keeps probe parallelism") {
    // 90% of rows on one key — broadcast mode is the documented answer:
    // the index ships everywhere, the probe side stays embarrassingly
    // parallel regardless of key distribution
    val rnd = new scala.util.Random(33)
    def tbl(n: Int) = (0 until n).map { i =>
      val contig = if (i % 10 != 0) "chrHOT" else s"chr${rnd.nextInt(5)}"
      val s = rnd.nextInt(2000)
      (contig, s, s + rnd.nextInt(50))
    }.toDF("contig", "pos_start", "pos_end")
    val a = tbl(2000).cache()
    val b = tbl(2000).cache()
    a.count(); b.count()
    val al = a.select($"contig".as("ac"), $"pos_start".as("as_"), $"pos_end".as("ae"))
    val bl = b.select($"contig".as("bc"), $"pos_start".as("bs"), $"pos_end".as("be"))
    val cond = $"ac" === $"bc" && $"as_" <= $"be" && $"ae" >= $"bs"
    val fast = al.join(bl, cond).count()
    spark.conf.set(GraftSession.PreferIntervalJoin, "false")
    val slow = al.join(bl, cond).count()
    spark.conf.set(GraftSession.PreferIntervalJoin, "true")
    assert(fast == slow && fast > 0)
    a.unpersist(); b.unpersist()
  }
}
