package graft

import org.apache.spark.sql.types._

/** Adversarial rendering audit — the s29 lesson, generalized. The driver's
  * gate hashes STRING RENDERINGS of every checked cell after a DuckDB +
  * pandas round trip (columns sorted by name, rows sorted, `str(a) !=
  * str(b)` the last word — `tools/oracle_check.py`), so any output dtype
  * with engine-private formatting freedom is a latent hash mismatch even
  * when the values are semantically equal. s29_silhouette was red at the
  * driver for two rounds with rows/schema green because it was the one
  * query whose checked output carried raw DECIMAL(38,0) columns; every
  * local replica rendered them identically, the driver's path did not.
  *
  * This spec closes that class pre-driver: it resolves the output schema of
  * EVERY gated query (the full `SparkEntry.queries` map, the same builders
  * `graft.Verify` runs) against real sf0.001 tables and pins the dtype
  * inventory to the closed rendering-safe set:
  *
  *   - BIGINT / INT / BOOLEAN — integers render identically everywhere;
  *   - DOUBLE — safe because every gated double is produced under the
  *     Exact contract (decimal-truncated accumulation, bit-exact on both
  *     engines; float64 → str is IEEE-deterministic in the checker);
  *   - STRING — the canonical escape hatch wide values must route through
  *     (the s29 fix renders its DECIMAL(38,0) sums as digit strings);
  *   - DATE / TIMESTAMP — both engines emit them as UTC parquet logical
  *     types and pandas renders one canonical form.
  *
  * Forbidden by omission, i.e. a failure here, pre-driver: DECIMAL of any
  * precision (the s29 class), FLOAT (float32 → repr drift vs a float64
  * oracle), BINARY (bytes repr is engine-private), ARRAY/MAP/STRUCT (list
  * rendering differs between numpy and DuckDB), and any temporal beyond
  * DATE/TIMESTAMP. A new query that needs a wide or nested value must fold
  * it to one of the safe dtypes (Exact.fmt / digit strings / exploded
  * rows) BEFORE it reaches the checked output — exactly what every green
  * query already does.
  *
  * The `e2e_` replay class is excluded: those builders run full streaming
  * pipelines (minutes each; exercised by EndToEndSpec and the driver gate
  * itself), and their checked outputs are read back from the same parquet
  * sinks whose schemas the batch queries in this inventory already cover.
  */
class OutputDtypeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private val safe: Set[DataType] =
    Set(LongType, IntegerType, DoubleType, StringType, BooleanType,
      DateType, TimestampType)

  test("every gated query's checked output carries only rendering-safe dtypes") {
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("e2e_"))
    val bad = scala.collection.mutable.ListBuffer[String]()
    for (name <- names) {
      val schema = SparkEntry.queries(name)(spark, sfDir).schema
      for (f <- schema.fields if !safe.contains(f.dataType))
        bad += s"$name.${f.name}: ${f.dataType.sql}"
    }
    assert(bad.isEmpty,
      s"rendering-unsafe checked-output dtypes (the s29 class):\n" +
        bad.mkString("\n"))
  }
}
