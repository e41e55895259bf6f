package graft

import org.apache.spark.sql.functions._

/** Conf-pinning entries must be self-contained under ANY execution
  * order (Verify iterates an unordered Map): q105 pins
  * autoBroadcastJoinThreshold down to 1 KB and the bloom
  * application-side threshold down to 1 KB — if prep()'s reset ever
  * stopped restoring them, every later small-dim join would silently
  * lose its broadcast (a plan regression invisible to value compares).
  * This spec runs the pinning entry FIRST, then asserts a plain query
  * still broadcasts its small side and carries no runtime bloom. */
class ConfLeakSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("streaming replay's shuffle-partition pin does not leak") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    SparkEntry.queries("q71_streaming_window")(spark, dir).count()
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before,
      "runStreamToTable left its 8-partition replay pin in the session")
  }

  test("q105's threshold pins do not leak into the next entry") {
    SparkEntry.queries("q105_runtime_filter")(spark, dir).count()
    val after = SparkEntry.queries("q3_join_agg")(spark, dir)
    val plan = after.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"),
      s"small-dim join lost its broadcast after q105's pins:\n$plan")
    assert(!plan.toLowerCase.contains("might_contain"),
      s"bloom threshold pin leaked into a plain query:\n$plan")
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      == "10MB")
  }
}
