package graft

class ReplSpec extends SparkTestBase {

  import spark.implicits._

  test("splitStatements: terminators, quoted semicolons, comments") {
    assert(Repl.splitStatements("SELECT 1; SELECT 2;") ==
      Seq("SELECT 1", "SELECT 2"))
    assert(Repl.splitStatements("SELECT 'a;b' AS x;") ==
      Seq("SELECT 'a;b' AS x"))
    assert(Repl.splitStatements("SELECT 1") == Seq("SELECT 1"))
    assert(Repl.splitStatements("-- only a comment\n;") == Seq.empty)
    assert(Repl.splitStatements("  ;;  ") == Seq.empty)
  }

  test("execute runs q1-shaped SQL through the installed session") {
    Seq(("a", 1.0), ("a", 2.0), ("b", 5.0))
      .toDF("k", "v").createOrReplaceTempView("repl_t")
    val out = Repl.execute(spark,
      "SELECT k, sum(v) AS s FROM repl_t GROUP BY k ORDER BY k")
    assert(out.contains("a") && out.contains("3.0") && out.contains("5.0"))
  }

  test("execute row cap matches the reference's Limited(100) default") {
    spark.range(250).createOrReplaceTempView("repl_r")
    val out = Repl.execute(spark, "SELECT id FROM repl_r ORDER BY id")
    // showString(100): 100 data rows + "only showing top 100 rows"
    assert(out.contains("only showing top 100 rows"))
    assert(!out.contains("\n|  200"))
  }

  test("interval-join SQL through execute plans IntervalJoinExec") {
    Seq(("c1", 1, 5), ("c1", 7, 9)).toDF("contig", "pos_start", "pos_end")
      .createOrReplaceTempView("repl_target")
    Seq(("c1", 2, 3), ("c1", 8, 8)).toDF("contig", "pos_start", "pos_end")
      .createOrReplaceTempView("repl_read")
    val sql =
      """SELECT count(*) AS n FROM repl_target a JOIN repl_read b
        |ON a.contig = b.contig AND a.pos_start <= b.pos_end
        |AND a.pos_end >= b.pos_start""".stripMargin
    val plan = spark.sql(sql).queryExecution.executedPlan.toString
    // count(*) over an interval join rewrites further, into the count
    // pushdown operator — both are the engine's own interval nodes
    assert(plan.contains("IntervalJoin") || plan.contains("IntervalCount"),
      s"expected an interval operator in:\n$plan")
    val out = Repl.execute(spark, sql)
    assert(out.contains("2"))
  }
}
