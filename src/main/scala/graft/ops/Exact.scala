package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic floating-point aggregation helpers.
  *
  * A plain `sum(double)` depends on partial-aggregation order, which differs
  * run-to-run (and engine-to-engine vs the DuckDB oracle). Routing the sum
  * through an exact DECIMAL accumulator makes the reduction associative and
  * bit-reproducible at any parallelism — the property that matters when the
  * same query runs on 32 local threads today and 1000 executors at 100 TB.
  * The final cast back to double is a single deterministic rounding.
  */
object Exact {

  /** Order-independent sum of a double column (exact decimal accumulate). */
  def sumD(c: Column, scale: Int = 4): Column =
    sum(c.cast(s"decimal(30,$scale)")).cast("double")

  /** Order-independent mean of a double column. */
  def avgD(c: Column, scale: Int = 4): Column =
    sumD(c, scale) / count(c)

  /** Render a double with fixed decimals (C-printf compatible, matches
    * DuckDB's printf('%.Nf', x) digit-for-digit). Use for hash-stable output
    * columns derived from per-row double arithmetic. */
  def fmt(c: Column, decimals: Int = 4): Column =
    format_string(s"%.${decimals}f", c)
}
