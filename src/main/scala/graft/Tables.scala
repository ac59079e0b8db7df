package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated test tables (see /root/repo/TESTDATA.md).
  *
  * Parquet scans: Catalyst pushes filters/column pruning into the scan, so
  * callers should select/filter on the returned DataFrame directly — no
  * pre-materialization here. At 100 TB these would be partitioned/bucketed
  * tables; the loader API stays the same.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** events.parquet's `ts` physical encoding has changed across testdata
    * regenerations (TIMESTAMP(NANOS) → timestamp[us]); adapt to whatever the
    * file actually stores instead of assuming one writer forever:
    *   - LongType (TIMESTAMP(NANOS) surfaced via `nanosAsLong`): truncate
    *     nanos→micros with integer `div` — ns epochs exceed double's exact
    *     range, so fp division would corrupt them. Matches DuckDB ns→us cast.
    *   - TimestampNTZType (timestamp[us], no UTC flag): cast once to
    *     session-TZ TimestampType. All engine sessions pin
    *     spark.sql.session.timeZone=UTC, so the cast is micros-identity and
    *     matches the NTZ-native DuckDB oracle.
    *   - TimestampType (timestamp[us], adjusted to UTC): use directly.
    * Anything else is a loud error, not a 39-query silent blackout. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other =>
        throw new IllegalStateException(
          s"$dir/events.parquet: unsupported physical type for ts: $other " +
            "(expected TIMESTAMP(NANOS)-as-long, timestamp[us] NTZ, or timestamp[us] UTC)")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
