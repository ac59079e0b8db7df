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

  /** Interval × interval OVERLAP join (`a.lo < b.hi AND b.lo < a.hi`,
    * half-open integer intervals) — the two-sided generalization of
    * [[viaBins]], the join shape behind span alignment (PII spans vs chunk
    * boundaries, ad impressions vs sessions). A raw overlap predicate is a
    * nested-loop in Spark; here BOTH sides expand into the fixed-width bins
    * they cover and equi-join on the bin.
    *
    * A pair of overlapping intervals co-occurs in EVERY bin their
    * intersection touches, so naive bin reporting needs a pair-level
    * DISTINCT — an extra exchange sized like the output. The OWNER-BIN rule
    * removes it: any overlapping pair both covers the point
    * `max(lo_a, lo_b)` (overlap means `max(lo) < min(hi)`), so exactly the
    * bin containing that point reports the pair, and every other co-bin is
    * filtered locally before any shuffle. Dedup-free by construction.
    *
    * Scale: expansion factor per side = interval width / binWidth + 1 (pick
    * `binWidth` near the typical interval width); the shuffle key is a
    * uniform integer bin, so skew appears only where intervals pile onto
    * one region of the axis — the usual salting escape applies unchanged.
    *
    * Bounds are taken as integer-exact longs: callers quantize doubles onto
    * an integer grid first (an engine-specific ULP under the boundary
    * predicate is a correctness bug, not a tie-break detail). Left and
    * right column names must be disjoint.
    *
    * EMPTY intervals (hi <= lo) match NOTHING — the set-semantics reading
    * of [lo, hi). Note this is stricter than the naive SQL predicate
    * `a.lo < b.hi AND b.lo < a.hi`, which wrongly claims an empty interval
    * sitting strictly inside a non-empty one "overlaps" it; that predicate
    * is only a correct overlap test when both intervals are non-empty.
    *
    * `keys` adds equi-join key pairs (leftCol, rightCol) ALONGSIDE the bin —
    * the production shape: an unkeyed interval join over an axis whose
    * density grows with the corpus is inherently quadratic (every new
    * interval overlaps a constant fraction of an ever-denser axis), while
    * intervals scoped to a key (sessions × impressions per user, spans per
    * document) keep per-key density constant and the output linear. The key
    * also joins the shuffle key, so bin hot-spots spread across keys. */
  def overlapViaBins(left: DataFrame, lloCol: String, lhiCol: String,
                     right: DataFrame, rloCol: String, rhiCol: String,
                     binWidth: Long,
                     keys: Seq[(String, String)] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // last covered bin is the one holding hi-1 (hi exclusive); empty or
    // negative-width intervals expand to no bins and drop out
    def expand(df: DataFrame, lo: String, hi: String) = df
      .filter(col(hi) > col(lo))
      .withColumn("__bin", explode(sequence(
        floor(col(lo).cast("double") / binWidth).cast("long"),
        floor((col(hi).cast("double") - 1) / binWidth).cast("long"))))
    val joinCond = keys.foldLeft(col("__bin") === col("__rbin")) {
      case (c, (lk, rk)) => c && col(lk) === col(rk)
    }
    expand(left, lloCol, lhiCol)
      .join(expand(right, rloCol, rhiCol).withColumnRenamed("__bin", "__rbin"),
        joinCond)
      .filter(col(lloCol) < col(rhiCol) && col(rloCol) < col(lhiCol))
      .filter(col("__bin") ===
        floor(greatest(col(lloCol), col(rloCol)).cast("double") / binWidth).cast("long"))
      .drop("__bin", "__rbin")
  }
}
