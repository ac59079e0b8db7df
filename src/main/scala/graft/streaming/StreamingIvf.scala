package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.ops.SimilarityOps

/** Streaming ANN index maintenance — the scale path for similarity search
  * over a GROWING embedding corpus: new vectors arrive as a stream, each
  * micro-batch is assigned to its nearest centroid (broadcast cross join,
  * no shuffle of the batch) and appended to a parquet table PHYSICALLY
  * partitioned by cell id. Search then reads only the probed cells — a
  * static `IN` partition filter, so at 100 TB a query touches
  * ~nprobe/nlist of the files regardless of corpus growth.
  *
  * The centroid set is frozen at index-build time (the standard IVF
  * contract: re-train centroids offline, rebuild or re-assign on drift —
  * re-assignment is one batch job over the table).
  */
class IvfIndex(val path: String, centroids: DataFrame) extends Serializable {

  /** Assign a (micro-)batch to cells and append it to the index. */
  def append(batch: DataFrame, idCol: String, vecCol: String): Unit =
    SimilarityOps.assignToCentroids(batch, centroids, idCol, vecCol)
      .write.mode("append").partitionBy("centroid_id").parquet(path)

  /** Streaming sink maintaining the index (exactly-once per batch via the
    * checkpoint; appends are idempotent at the cell-file level). */
  def writer(stream: DataFrame, idCol: String, vecCol: String,
             checkpoint: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) => append(batch, idCol, vecCol) }

  /** ANN top-k over the indexed corpus. The probed cell ids (a bounded
    * #queries × nprobe driver list) become a static partition filter, so
    * the parquet scan plans with PartitionFilters = centroid_id IN (...) —
    * unread cells are never listed, opened, or scored. */
  def search(spark: SparkSession, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val probes = SimilarityOps.probeCells(queries, centroids, idCol, vecCol, nprobe)
    val cells = probes.select(col("centroid_id")).distinct()
      .collect().map(_.get(0)) // metadata-sized: #queries × nprobe ids
    val corpus = spark.read.parquet(path)
      .filter(col("centroid_id").isin(cells.toIndexedSeq: _*))
    SimilarityOps.scoreProbedCells(corpus, probes, idCol, vecCol, k)
  }
}
