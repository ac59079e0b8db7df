package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: match fact rows to the band whose `[lo, hi)`
  * interval contains the fact's value.
  *
  * Spark plans a raw `value >= lo AND value < hi` join as a nested-loop —
  * fine when one side broadcasts, quadratic when both sides are large. The
  * scale shape is BIN EXPANSION: expand each band into the fixed-width bins
  * it overlaps, bin the fact value with the same width, and equi-join on the
  * bin (hash/sort-merge, shuffle on a uniform integer key), keeping the
  * exact range predicate as a residual filter for bands that do not align
  * to bin boundaries. Expansion factor = band width / bin width, so pick
  * `binWidth` near the typical band width. This is the same trick Spark's
  * own range-join hints and interval-join implementations in streaming
  * engines use (bucketed interval index).
  */
object RangeJoin {

  /** Join `fact` (with numeric `valueCol`) to `bands` (with numeric
    * `loCol`/`hiCol`, interval semantics `lo <= v < hi`) via bin expansion.
    * Returns fact rows joined with their matching band's columns. Bands must
    * not overlap if each value is to match at most one band (not enforced).
    */
  def viaBins(fact: DataFrame, valueCol: String, bands: DataFrame,
              loCol: String, hiCol: String, binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // ceil semantics via floor(-x): the last bin is floor of the largest
    // value strictly below hi — for hi exactly on a bin boundary that bin
    // is excluded, keeping the expansion tight.
    val expanded = bands.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        (-floor(-col(hiCol) / binWidth)).cast("long") - 1)))
    val binned = fact.withColumn("__bin",
      floor(col(valueCol) / binWidth).cast("long"))
    binned.join(expanded, "__bin")
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bin")
  }
}
