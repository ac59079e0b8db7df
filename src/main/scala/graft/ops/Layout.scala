package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Physical-layout keys for multi-dimensional data skipping.
  *
  * A table sorted on ONE column gives parquet min/max stats selectivity on
  * that column only; a 2-D range query (user ∈ [a,b] AND value ∈ [c,d])
  * over 100 TB then scans every file. Sorting by the Morton (Z-order)
  * interleave of both dimensions makes each file's zkey range bound BOTH
  * dimensions at once — the standard clustering move (Delta/Iceberg
  * OPTIMIZE ZORDER BY) that turns the same stats into 2-D file skipping.
  *
  * The key is pure bit arithmetic (32 shift/mask/or terms, one codegen'd
  * projection — no UDF), so any engine computes the identical BIGINT and
  * a write path can `sortWithinPartitions(zkey)` with zero extra state.
  */
object Layout {

  /** Morton interleave of the low 16 bits of two non-negative dimensions:
    * bit i of `a` lands at 2i+1, bit i of `b` at 2i — a 32-bit zkey. */
  def morton16(a: Column, b: Column): Column = {
    val aa = a.cast("long").bitwiseAND(lit(0xFFFFL))
    val bb = b.cast("long").bitwiseAND(lit(0xFFFFL))
    (0 until 16).map { i =>
      shiftleft(shiftright(aa, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(bb, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }

  /** The same interleave as engine-portable SQL (for oracles / pushdown
    * into engines that take expression strings). */
  def morton16Sql(aExpr: String, bExpr: String): String =
    (0 until 16).map { i =>
      s"((((($aExpr) >> $i) & 1) << ${2 * i + 1}) | (((($bExpr) >> $i) & 1) << ${2 * i}))"
    }.mkString("(", " | ", ")")
}
