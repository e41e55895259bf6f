package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Physical-layout helpers (write-side clustering).
 *
 * [[zorder2]] is the multi-dimensional generalization of the q106
 * sorted write: interleaving the bits of two columns and sorting by
 * the result clusters rows so that BOTH dimensions' values are locally
 * correlated — every row group's min/max stats are then tight on both
 * raw columns at once, and a 2-D range predicate prunes row groups the
 * way a 1-D sort only manages for its single key (the Databricks
 * OPTIMIZE ZORDER / query-acceleration pattern, built here from plain
 * bit arithmetic — no new kernel). The z-value is a WRITE-TIME
 * clustering key only; queries keep filtering the raw columns, so no
 * reader-side z-interval decomposition is needed.
 */
object Layout {

  /** Bit-interleaved Morton code of two non-negative int columns
    * (`bits` low bits each; callers bound their dims, e.g. `% 1024`).
    * a's bit i lands at position 2i, b's at 2i+1. */
  def zorder2(a: Column, b: Column, bits: Int = 10): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31] (got $bits)")
    (0 until bits).map { i =>
      shiftleft(a.cast("long").bitwiseAND(lit(1L << i)), i)
        .bitwiseOR(
          shiftleft(b.cast("long").bitwiseAND(lit(1L << i)), i + 1))
    }.reduce(_ bitwiseOR _)
  }
}
