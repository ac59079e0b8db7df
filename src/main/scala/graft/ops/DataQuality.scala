package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the constraint-validation pass
  * (completeness, uniqueness, referential integrity, value ranges) that
  * gates every production ingest before data is admitted downstream; the
  * operation family Deequ/Great Expectations exposes, re-expressed as plain
  * Catalyst aggregates.
  *
  * Every check yields one row `(check, n_bad, n_rows)`: the violation count
  * and the checked population, so callers threshold on exact integers
  * (never a pre-rounded ratio).
  *
  * Scale design: the expensive mistake in naive audits is one table scan
  * PER constraint. [[rowChecks]] folds all row-local predicates over a
  * table into ONE scan — each check is a conditional-sum aggregate, all
  * partial-aggregated map-side, so a 100 TB table is read once no matter
  * how many range/null/accepted-value constraints ride it. The only checks
  * that shuffle are the relational ones: [[uniqueness]] (one hash
  * aggregate on the key) and [[refIntegrity]] (an anti join — broadcast
  * when the parent's key side is dimension-sized, as TPC-H parents are).
  */
object DataQuality {

  /** All row-local checks over one table in a single scan: each entry is
    * (check name, VIOLATION predicate). Returns one row per check. */
  def rowChecks(df: DataFrame, table: String,
                checks: Seq[(String, Column)]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      checks.map { case (name, bad) =>
        sum(when(bad, 1L).otherwise(0L)).as(s"bad_$name") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = checks.map { case (name, _) =>
      struct(lit(s"$table.$name").as("check_name"),
        col(s"bad_$name").as("n_bad"), col("n_rows")).as("s")
    }
    one.select(explode(array(stacked: _*)).as("s")).select(col("s.*"))
  }

  /** Rows whose key occurs more than once (Deequ's uniqueness violation
    * count): one hash aggregate on the key, then a count-weighted sum of
    * the duplicated groups — no self-join. */
  def uniqueness(df: DataFrame, table: String, keyCols: Seq[String]): DataFrame = {
    val grouped = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("cnt"))
    grouped.agg(
      coalesce(sum(when(col("cnt") > 1, col("cnt"))), lit(0L)).as("n_bad"),
      sum(col("cnt")).as("n_rows"))
      .select(lit(s"$table.unique_${keyCols.mkString("_")}").as("check_name"),
        col("n_bad"), col("n_rows"))
  }

  /** Child rows whose foreign key has no parent (orphans): a left anti
    * join on the key. NULL foreign keys are orphans here too — anti join
    * keeps null-keyed rows (null never equals a parent key), matching the
    * audit intent that a null reference is a violation, not a pass. */
  def refIntegrity(child: DataFrame, table: String, fkCol: String,
                   parent: DataFrame, pkCol: String): DataFrame = {
    val orphans = child.select(col(fkCol))
      .join(parent.select(col(pkCol).as(fkCol)), Seq(fkCol), "left_anti")
    val counts = child.agg(count(lit(1)).as("n_rows"))
    orphans.agg(count(lit(1)).as("n_bad")).crossJoin(counts)
      .select(lit(s"$table.fk_$fkCol").as("check_name"), col("n_bad"), col("n_rows"))
  }

  /** Union of check relations into the audit report, ordered by check name
    * (deterministic output relation; each input is a handful of rows). */
  def audit(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_.unionByName(_)).orderBy(col("check_name"))
}
