package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Driver contract — one entry per implemented operator from SURVEY.md §2,
 * each with a DuckDB-equivalent oracle in [[SparkEntry.oracleSql]].
 *
 * Interval-join queries derive interval tables `(contig, pos_start,
 * pos_end)` from the driver's `events` parquet with pure integer
 * arithmetic, so the Spark SQL and the DuckDB oracle compute identical
 * inputs (reference query shape: /root/reference/queries/q1-coitrees.sql).
 */
object SparkEntry {

  /** Interval tables A/B derived from events; dialect-neutral SQL
    * (valid in both Spark SQL and DuckDB). */
  private val cteAB: String =
    """WITH a AS (
      |  SELECT event_id AS a_id,
      |         CAST(user_id % 20 AS INT) AS contig,
      |         CAST((event_id * 37) % 100000 AS INT) AS pos_start,
      |         CAST((event_id * 37) % 100000 + event_id % 1000 AS INT) AS pos_end
      |  FROM events
      |), b AS (
      |  SELECT event_id AS b_id,
      |         CAST(user_id % 20 AS INT) AS contig,
      |         CAST((event_id * 53) % 100000 AS INT) AS pos_start,
      |         CAST((event_id * 53) % 100000 + event_id % 700 AS INT) AS pos_end
      |  FROM events
      |)""".stripMargin

  /** Queries whose SQL text is identical in Spark SQL and DuckDB. */
  private[graft] val sharedSql: Map[String, String] = Map(
    // ---- §2b inherited relational surface -------------------------------
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       ROUND(SUM(l_quantity), 2) AS sum_qty,
        |       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
        |       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       ROUND(AVG(l_quantity), 6) AS avg_qty,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_quantity < 48
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter" ->
      """SELECT p_partkey, p_name, p_retailprice
        |FROM part
        |WHERE p_size > 30 AND p_brand = 'Brand#3'""".stripMargin,
    "q3_join_agg" ->
      """SELECT c_mktsegment, COUNT(*) AS n_lines,
        |       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q4_sort_limit" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q5_cross" ->
      """SELECT r_name, n_name
        |FROM region CROSS JOIN nation""".stripMargin,
    "q6_window_agg" ->
      """SELECT user_id, date_trunc('hour', ts) AS h,
        |       COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
        |FROM events
        |GROUP BY user_id, date_trunc('hour', ts)""".stripMargin,
    "q7_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn = 1""".stripMargin,
    "q8_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q9_setop" ->
      """SELECT c_custkey AS k FROM customer
        |INTERSECT
        |SELECT o_custkey AS k FROM orders""".stripMargin,
    // ---- §2a interval join (the engine's flagship) ----------------------
    "q10_interval_join" -> (cteAB +
      """
        |SELECT a.contig AS contig, COUNT(*) AS cnt
        |FROM a JOIN b ON a.contig = b.contig
        | AND a.pos_start <= b.pos_end AND a.pos_end >= b.pos_start
        |GROUP BY a.contig""".stripMargin),
    "q11_interval_strict" -> (cteAB +
      """
        |SELECT a.contig AS contig, COUNT(*) AS cnt
        |FROM a JOIN b ON a.contig = b.contig
        | AND a.pos_start < b.pos_end AND a.pos_end > b.pos_start
        |GROUP BY a.contig""".stripMargin),
    "q12_interval_keyless" -> (cteAB +
      """
        |SELECT COUNT(*) AS cnt
        |FROM a JOIN b ON a.pos_start <= b.pos_end AND a.pos_end >= b.pos_start
        |WHERE a.pos_start < 5000 AND b.pos_start < 5000""".stripMargin),
    "q13_interval_partitioned" -> (cteAB +
      """
        |SELECT a.contig AS contig, COUNT(*) AS cnt
        |FROM a JOIN b ON a.contig = b.contig
        | AND a.pos_start <= b.pos_end AND a.pos_end >= b.pos_start
        |GROUP BY a.contig""".stripMargin),
    "q15_interval_ailist" -> (cteAB +
      """
        |SELECT a.contig AS contig, COUNT(*) AS cnt
        |FROM a JOIN b ON a.contig = b.contig
        | AND a.pos_start <= b.pos_end AND a.pos_end >= b.pos_start
        |GROUP BY a.contig""".stripMargin)
  )

  /** Spark text for the nearest join: plain overlap join run under
    * `algorithm=nearest` (mirrors the reference's CoitreesNearest conf
    * switch, /root/reference sequila-core session_context.rs:53). */
  private val nearestSparkSql: String = cteAB +
    """
      |SELECT b.b_id AS b_id, b.contig AS contig,
      |       b.pos_start AS b_start, b.pos_end AS b_end,
      |       a.pos_start AS a_start, a.pos_end AS a_end
      |FROM a JOIN b ON a.contig = b.contig
      | AND a.pos_start <= b.pos_end AND a.pos_end >= b.pos_start""".stripMargin

  /** DuckDB oracle for the nearest join: window-ranked candidate join
    * pinning the deterministic semantics (overlap with min (start,end),
    * else min genomic distance, ties by (start,end); NULL-padded left for
    * probe keys with no build rows). */
  private val nearestOracleSql: String = cteAB +
    """,
      |cand AS (
      |  SELECT b.b_id, b.contig, b.pos_start AS b_start, b.pos_end AS b_end,
      |         a.pos_start AS a_start, a.pos_end AS a_end,
      |         CASE WHEN a.pos_start <= b.pos_end AND a.pos_end >= b.pos_start THEN 0
      |              WHEN a.pos_start > b.pos_end THEN a.pos_start - b.pos_end
      |              ELSE b.pos_start - a.pos_end END AS dist
      |  FROM b JOIN a ON a.contig = b.contig
      |), ranked AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY b_id
      |    ORDER BY (CASE WHEN dist = 0 THEN 0 ELSE 1 END), dist, a_start, a_end) AS rn
      |  FROM cand
      |)
      |SELECT b_id, contig, b_start, b_end, a_start, a_end FROM ranked WHERE rn = 1
      |UNION ALL
      |SELECT b.b_id, b.contig, b.pos_start, b.pos_end, NULL, NULL
      |FROM b WHERE NOT EXISTS (SELECT 1 FROM a WHERE a.contig = b.contig)""".stripMargin

  private def run(sql: String, confs: (String, String)*)
      : (SparkSession, String) => DataFrame = { (spark, sfDir) =>
    Tables.registerAll(spark, sfDir)
    GraftSession.install(spark)
    // Reset the graft confs to this query's requirements (each query fn is
    // self-contained — Verify/Bench may run them in any order).
    spark.conf.set(GraftSession.PreferIntervalJoin, "true")
    spark.conf.set(GraftSession.IntervalJoinAlgorithm, "superintervals")
    spark.conf.set(GraftSession.IntervalJoinForceMode, "")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    spark.sql(sql)
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q10_interval_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ LLM-pipeline
    * operators). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> run(sharedSql("q1_agg")),
    "q2_filter" -> run(sharedSql("q2_filter")),
    "q3_join_agg" -> run(sharedSql("q3_join_agg")),
    "q4_sort_limit" -> run(sharedSql("q4_sort_limit")),
    "q5_cross" -> run(sharedSql("q5_cross")),
    "q6_window_agg" -> run(sharedSql("q6_window_agg")),
    "q7_window_rank" -> run(sharedSql("q7_window_rank")),
    "q8_distinct" -> run(sharedSql("q8_distinct")),
    "q9_setop" -> run(sharedSql("q9_setop")),
    "q10_interval_join" -> run(sharedSql("q10_interval_join")),
    "q11_interval_strict" -> run(sharedSql("q11_interval_strict")),
    "q12_interval_keyless" -> run(sharedSql("q12_interval_keyless")),
    "q13_interval_partitioned" -> run(sharedSql("q13_interval_partitioned"),
      GraftSession.IntervalJoinForceMode -> "partitioned"),
    "q14_interval_nearest" -> run(nearestSparkSql,
      GraftSession.IntervalJoinAlgorithm -> "nearest"),
    "q15_interval_ailist" -> run(sharedSql("q15_interval_ailist"),
      GraftSession.IntervalJoinAlgorithm -> "ailist")
  )

  /** DuckDB-equivalent SQL per query (same parquet-backed table names). */
  def oracleSql: Map[String, String] =
    (sharedSql - "q13_interval_partitioned" - "q15_interval_ailist") ++ Map(
      // same result as q10 — different execution mode / index algorithm
      "q13_interval_partitioned" -> sharedSql("q10_interval_join"),
      "q15_interval_ailist" -> sharedSql("q10_interval_join"),
      "q14_interval_nearest" -> nearestOracleSql
    )
}
