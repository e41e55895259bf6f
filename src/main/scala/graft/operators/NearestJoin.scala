package graft.operators

import graft.plans.{IntervalCondition, NearestIntervalJoin}

import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim}

/**
 * Explicit nearest-interval-join API.
 *
 * For each right (probe) row emits exactly one output row: the joined
 * nearest left (build) interval for its equi-key — an overlapping interval
 * if any exists (deterministic: min (start, end)), else the closest by
 * genomic distance (ties by (start, end)) — or a NULL-padded left side if
 * the key has no build rows at all.
 *
 * `condition` must be an interval-overlap condition (optional equi-keys
 * AND a two-sided range pair, e.g.
 * `a("contig") === b("contig") && a("start") <= b("end") && a("end") >= b("start")`);
 * it defines which columns are the interval bounds and keys — nearest
 * semantics then *extend* the overlap with distance fallback, exactly like
 * the reference's CoitreesNearest algorithm applied to an overlap query
 * (reference: sequila-core/src/physical_planner/joins/interval_join.rs:909-990).
 */
object NearestJoin {

  def apply(left: DataFrame, right: DataFrame, condition: Column): DataFrame = {
    val spark = left.sparkSession
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    val cond = GraftSqlShim.expression(spark, condition)
    // Column references from df("col") stay unresolved until analysis
    // (plan-id tags) — build the node, let the analyzer resolve it, then
    // validate the resolved condition so misuse fails with a clear message
    // instead of a planner error.
    val df = GraftSqlShim.ofRows(spark, NearestIntervalJoin(lPlan, rPlan, cond))
    df.queryExecution.analyzed match {
      case NearestIntervalJoin(l, r, resolved) =>
        IntervalCondition.extract(resolved, l, r) match {
          case None =>
            throw new IllegalArgumentException(
              "NearestJoin condition must be an interval overlap " +
                "(optional equi-keys AND leftStart<=rightEnd AND leftEnd>=rightStart); " +
                s"got: ${resolved.sql}")
          case Some(ic) if ic.residual.nonEmpty =>
            throw new IllegalArgumentException(
              "NearestJoin condition must not contain extra predicates beyond " +
                s"equi-keys and the range pair; residual: ${ic.residual.get.sql}")
          case _ => ()
        }
      case _ => () // analyzer rewrote the node shape — planner will validate
    }
    df
  }
}
