package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance via mergeable partial
  * aggregates.
  *
  * The 100 TB shape: a derived aggregate (the "view") is kept in MERGEABLE
  * form — per key, a count and an exact DECIMAL sum — so refreshing it after
  * a new data delta lands costs one scan of the DELTA plus a keyed merge
  * against the aggregate-sized snapshot, never a recompute over the full
  * history. The same algebra the engine already uses for sketch partials
  * (o16 HLL, o17 CMS, o20 histograms) applied to plain additive aggregates:
  * count and sum are commutative monoids, so
  * `merge(partial(A), partial(B)) == partial(A ∪ B)` exactly — and because
  * the sum is decimal-exact the equality is bit-for-bit, not approximate,
  * at any partitioning and any merge order.
  *
  * Deletions/updates follow the same algebra with negated rows (a retracted
  * row contributes (-1, -v)); the o18 SCD2 and o22 snapshot-diff operators
  * produce exactly such change relations.
  *
  * Ref behavior mirrored: the reference maintains its per-minute aggregate
  * table incrementally from the stream rather than recomputing history
  * (resources/flink/main.py:105-120 — the resident windowed insert); this is
  * the batch/backfill counterpart.
  */
object Incremental {

  /** One key's share of the view, in mergeable (n, s) form: row count and
    * exact decimal sum of `value`. A narrow partial-aggregated groupBy —
    * map-side combine reduces each input split to at most |keys| rows
    * before the exchange. */
  def partial(df: DataFrame, keys: Seq[Column], value: Column,
              scale: Int = 4): DataFrame =
    df.groupBy(keys: _*)
      .agg(count(lit(1)).as("n"), sum(value.cast(s"decimal(30,$scale)")).as("s"))

  /** Merge partial snapshots (identical key columns) into the aggregate
    * over the union of their inputs. Inputs are aggregate-sized, so this
    * shuffles view rows, not data rows. */
  def merge(partials: Seq[DataFrame], keyNames: Seq[String]): DataFrame = {
    require(partials.nonEmpty, "nothing to merge")
    partials.reduce(_.unionByName(_))
      .groupBy(keyNames.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"))
  }
}
