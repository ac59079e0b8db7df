package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-quality profiling: the per-column summary (counts, nulls, distinct,
  * bounds) a pipeline runs on every new partition of a 100 TB table before
  * admitting it — schema-drift and null-regression detection in one pass
  * over each column.
  *
  * Scale shape: one aggregation per profiled column over a COLUMN-PRUNED
  * scan — parquet reads only that column's pages per branch, so the whole
  * union costs about one full-width scan of IO, and every branch is a
  * narrow partial-agg'd exchange (a handful of rows cross it). The exact
  * n_distinct is the oracle-checkable contract at test scale; at 100 TB the
  * drop-in is approx_count_distinct (the o11 HLL path) — identical plan
  * shape, sketch-sized exchanges.
  *
  * min/max render to strings per type (doubles via the fixed %.4f contract,
  * timestamps second-truncated) so one relation profiles heterogeneous
  * columns without a union-type column.
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String]): DataFrame =
    columns.map { c =>
      val (mn, mx) = renderMinMax(df.schema(c).dataType, col(c))
      df.select(col(c))
        .agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col(c))).as("n_null"),
          count_distinct(col(c)).as("n_distinct"),
          mn.as("min_s"), mx.as("max_s"))
        .select(lit(c).as("column"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_s"), col("max_s"))
    }.reduce(_ unionAll _)

  private def renderMinMax(dt: DataType, c: Column): (Column, Column) = dt match {
    case DoubleType | FloatType =>
      (Exact.fmt(min(c).cast("double"), 4), Exact.fmt(max(c).cast("double"), 4))
    case TimestampType | TimestampNTZType =>
      (date_format(min(c), "yyyy-MM-dd HH:mm:ss"),
        date_format(max(c), "yyyy-MM-dd HH:mm:ss"))
    case _ => (min(c).cast("string"), max(c).cast("string"))
  }
}
