package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global ordering index — the two-pass range-partitioned rank that
  * replaces a single-partition `Window.orderBy(...).row_number()`.
  *
  * Pass 1 range-partitions by the order columns and counts rows per
  * partition (a metadata-sized driver list — one long per partition, never
  * data rows); pass 2 computes a per-partition local row_number (the window
  * is partitioned by the range-partition id, so every task ranks its own
  * slice in parallel) and adds the partition's cumulative offset.
  *
  * The order columns must form a total order (unique keys): the final index
  * is then independent of the sampling-based range boundaries.
  */
object Ranking {

  /** Attach the exclusive global running sum of `valueCol` in `orderCols`
    * order (`out` = sum of all PRIOR rows' values; first row gets 0). Same
    * two-pass shape as [[globalRowNumber]] — per-partition totals to the
    * driver (one long per partition), then parallel local cumsums plus the
    * partition offset. The order columns must form a total order. */
  def globalRunningSum(df: DataFrame, orderCols: Seq[Column], valueCol: Column,
                       out: String = "cumsum"): DataFrame = {
    val ranged = df.withColumn("__val", valueCol.cast("long"))
      .repartitionByRange(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val valIdx = ranged.schema.fieldIndex("__val")
    val totals = ranged.queryExecution.toRdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L
        it.foreach(r => s += (if (r.isNullAt(valIdx)) 0L else r.getLong(valIdx)))
        Iterator((i, s))
      }.collect().sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (pid, s) => val off = acc; acc += s; (pid, off) }
    val offDf = broadcast(
      df.sparkSession.createDataFrame(offsets.toSeq).toDF("__pid", "__poff"))
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .withColumn("__lsum", coalesce(sum(col("__val")).over(w), lit(0L)))
      .join(offDf, "__pid")
      .withColumn(out, col("__lsum") + col("__poff"))
      .drop("__pid", "__lsum", "__poff", "__val")
  }

  /** Attach a 1-based global position `out` (long — a global index must not
    * inherit row_number's 2^31 cap) ordered by `orderCols`. */
  def globalRowNumber(df: DataFrame, orderCols: Seq[Column],
                      out: String = "pos"): DataFrame = {
    // Freeze the partition assignment BEFORE running two actions over it:
    // repartitionByRange samples per-execution (and AQE may re-coalesce), so
    // without pinning, the counts pass and the rank pass could see different
    // boundaries — duplicated/missing positions, or pids silently dropped by
    // the offsets join. The eager localCheckpoint materializes the ranged
    // blocks once (with __pid baked into the rows) and both passes read them.
    val ranged = df.repartitionByRange(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // pass 1: per-partition counts → cumulative offsets (driver-side scan of
    // #partitions entries). Counted straight off the checkpointed blocks
    // (mapPartitionsWithIndex over InternalRows) — no exchange, no codegen
    // stage, no per-field deserialization; the index aligns with __pid
    // because localCheckpoint preserves partitioning.
    val counts = ranged.queryExecution.toRdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, c) => val off = acc; acc += c; (pid, off) }
    val offDf = broadcast(
      df.sparkSession.createDataFrame(offsets.toSeq).toDF("__pid", "__off"))
    // pass 2: parallel local rank + offset
    ranged
      .withColumn("__lrn",
        row_number().over(Window.partitionBy(col("__pid")).orderBy(orderCols: _*)))
      .join(offDf, "__pid")
      .withColumn(out, col("__lrn") + col("__off"))
      .drop("__pid", "__lrn", "__off")
  }
}
