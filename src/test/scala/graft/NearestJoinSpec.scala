package graft

import graft.operators.NearestJoin

/** Tests of the explicit nearest-join API (dedicated logical node): unlike
  * the conf-gated path, NULL padding works for non-nullable inputs because
  * the node owns its output schema. */
class NearestJoinSpec extends SparkTestBase {

  import spark.implicits._

  test("nearest join API: correct schema nullability and NULL padding") {
    // plain Ints (non-nullable) — the conf-gated path can't NULL-pad these
    val a = Seq(("a", "s", 5, 10))
      .toDF("contig", "strand", "pos_start", "pos_end")
    val b = Seq(("a", "s", 11, 13), ("a", "s", 20, 21), ("a", "x", 0, 1),
      ("b", "s", 1, 2)).toDF("contig", "strand", "pos_start", "pos_end")
    val al = a.select($"contig".as("ac"), $"strand".as("ast"),
      $"pos_start".as("a_start"), $"pos_end".as("a_end"))
    val bl = b.select($"contig".as("bc"), $"strand".as("bs"),
      $"pos_start".as("b_start"), $"pos_end".as("b_end"))
    val df = NearestJoin(al, bl,
      al("ac") === bl("bc") && al("ast") === bl("bs") &&
        al("a_start") <= bl("b_end") && al("a_end") >= bl("b_start"))
    assert(df.schema("a_start").nullable)
    assert(df.queryExecution.executedPlan.toString.contains("IntervalJoinExec"))
    val rows = df.collect().map(_.toSeq).toSet
    assert(rows.size == 4)
    assert(rows.contains(Seq("a", "s", 5, 10, "a", "s", 11, 13)))
    assert(rows.contains(Seq("a", "s", 5, 10, "a", "s", 20, 21)))
    assert(rows.contains(Seq(null, null, null, null, "a", "x", 0, 1)))
    assert(rows.contains(Seq(null, null, null, null, "b", "s", 1, 2)))
  }

  test("nearest join API: keyless (pure range) nearest") {
    val a = Seq((5, 10), (100, 110)).toDF("a_start", "a_end")
    val b = Seq((12, 13), (95, 98), (7, 8)).toDF("b_start", "b_end")
    val df = NearestJoin(a, b,
      a("a_start") <= b("b_end") && a("a_end") >= b("b_start"))
    val rows = df.collect().map(_.toSeq).toSet
    assert(rows == Set(
      Seq(5, 10, 12, 13),    // nearest by distance (gap 2 vs 88)
      Seq(100, 110, 95, 98), // gap 2 vs 85
      Seq(5, 10, 7, 8)))     // overlap
  }

  test("nearest join API rejects non-overlap conditions") {
    val a = Seq((1, 2)).toDF("x", "y")
    val b = Seq((1, 2)).toDF("u", "v")
    intercept[IllegalArgumentException] {
      NearestJoin(a, b, a("x") === b("u"))
    }
    intercept[IllegalArgumentException] {
      NearestJoin(a, b, a("x") <= b("v") && a("y") >= b("u") && a("x") + b("u") > 0)
    }
  }
}
