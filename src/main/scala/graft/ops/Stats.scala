package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational ordinary-least-squares — the aggregation form of linear
  * regression: slope/intercept from the five moment sums (n, Σx, Σy, Σxy,
  * Σx²), each routed through the exact DECIMAL accumulator so the fit is
  * order-independent at any parallelism and digit-mirrorable by a SQL
  * oracle. One grouped aggregation, map-side partials — regression over
  * 100 TB costs exactly one narrow exchange per group, the same shape as a
  * COUNT.
  *
  * Numerical contract: each moment TERM (x, y, x·y, x·x — exactly rounded
  * IEEE products) truncates to DECIMAL(38,scale) before the exact sum; the
  * closed-form slope/intercept arithmetic on the five sums is a short
  * mirrored chain of exactly rounded ops. Callers should center x near 0
  * (e.g. days since the group's first observation) so x² keeps headroom in
  * the decimal — raw epoch micros squared (~10³⁰) would eat 30 of the 38
  * digits before the fractional scale.
  */
object Stats {

  /** Per-group first/second moment sums (n, Σx, Σx²) with the same
    * exact-decimal contract as [[olsByGroup]] — the one-exchange building
    * block for mean/variance (and any downstream standardization). */
  def momentsByGroup(df: DataFrame, grp: Column, x: Column,
                     scale: Int = 10): DataFrame = {
    val dec = s"decimal(38,$scale)"
    df.select(grp.as("grp"), x.cast("double").as("x"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).cast("double").as("sx"),
        sum((col("x") * col("x")).cast(dec)).cast("double").as("sxx"))
  }

  /** Per-group OLS fit of y on x. Returns (grp, n, slope, intercept);
    * groups with zero x-variance (or a single point) yield null slope —
    * surfaced, not silently zeroed. */
  def olsByGroup(df: DataFrame, grp: Column, x: Column, y: Column,
                 scale: Int = 6): DataFrame = {
    val dec = s"decimal(38,$scale)"
    val m = df.select(grp.as("grp"), x.cast("double").as("x"), y.cast("double").as("y"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).cast("double").as("sx"),
        sum(col("y").cast(dec)).cast("double").as("sy"),
        sum((col("x") * col("y")).cast(dec)).cast("double").as("sxy"),
        sum((col("x") * col("x")).cast(dec)).cast("double").as("sxx"))
    val det = col("n") * col("sxx") - col("sx") * col("sx")
    m.select(col("grp"), col("n"),
        when(det =!= 0.0,
          (col("n") * col("sxy") - col("sx") * col("sy")) / det).as("slope"),
        col("sx"), col("sy"))
      .select(col("grp"), col("n"), col("slope"),
        when(col("slope").isNotNull,
          (col("sy") - col("slope") * col("sx")) / col("n")).as("intercept"))
  }
}
