package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
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
  * Layout: `path/__b=<epoch>/centroid_id=<cell>/part-*.parquet`. Streaming
  * micro-batches land under their batchId epoch, which makes replays
  * idempotent: a batch retried after a partial write (or replayed after a
  * restart before the checkpoint committed) first deletes its own epoch
  * directory, so the rewrite replaces — never duplicates — the previous
  * attempt. Maintenance passes ([[compactCells]], [[reassign]]) write
  * NEGATIVE, strictly decreasing epochs, so they can never collide with a
  * replayed batchId. As defense in depth against a maintenance pass that
  * crashed between its commit and the cleanup of the dirs it consumed,
  * [[search]] collapses duplicate vector ids before scoring.
  *
  * Writer/maintenance concurrency is epoch-FENCED: maintenance bumps a
  * generation token (`__fence=<g>` marker files — underscore-prefixed so
  * Spark's file discovery ignores them; max over markers = current gen,
  * created atomically so there is no read-torn state) BEFORE snapshotting
  * the epoch dirs it will consume, consumes exactly that snapshot, and
  * deletes exactly that snapshot. A writer stamps its batch into epoch
  * `gen·2^40 + batchId` and re-reads the fence AFTER its write commits: if
  * the generation moved, its directory may sit in a snapshot already
  * consumed (or about to be deleted), so it re-lands the batch under the
  * new generation's namespace — which post-dates every snapshot — and
  * retires its doomed attempt. A batch can thus appear at worst twice
  * (folded into the maintenance epoch AND re-landed); never zero times.
  * The duplicate collapses at [[search]]'s id guard and at the next
  * compaction.
  *
  * The centroid set is frozen at index-build time (the standard IVF
  * contract); on drift, [[reassign]] re-clusters the stored table against a
  * new centroid set in one batch pass.
  */
class IvfIndex(val path: String, val centroids: DataFrame,
               val topCentroids: Option[DataFrame] = None,
               val pq: Option[IvfIndex.PqConfig] = None) extends Serializable {

  private def fs(spark: SparkSession) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def epochDirs(spark: SparkSession): Seq[Path] = {
    val root = new Path(path)
    val f = fs(spark)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).filter(s => s.isDirectory && s.getPath.getName.startsWith("__b="))
      .map(_.getPath).toSeq
  }

  private def epochOf(dir: Path): Long = dir.getName.stripPrefix("__b=").toLong

  /** Next maintenance epoch: below every existing epoch and always < 0. */
  private def nextMaintenanceEpoch(spark: SparkSession): Long =
    math.min(-1L, epochDirs(spark).map(epochOf).foldLeft(0L)(math.min) - 1L)

  /** Writer epochs live at `gen · 2^40 + batchId`: generations never
    * collide for any realistic batch count, and gen 0 keeps the historical
    * plain-batchId layout. */
  private def fencedEpoch(gen: Long, epoch: Long): Long =
    gen * IvfIndex.FenceStride + epoch

  /** Current fence generation = max over `__fence=<g>` markers (0 if none). */
  private[graft] def fenceGen(spark: SparkSession): Long = {
    val root = new Path(path)
    val f = fs(spark)
    if (!f.exists(root)) 0L
    else f.listStatus(root)
      .filter(s => s.isFile && s.getPath.getName.startsWith("__fence="))
      .map(_.getPath.getName.stripPrefix("__fence=").toLong)
      .foldLeft(0L)(math.max)
  }

  /** Advance the fence before consuming epochs: any writer that commits
    * after this lands (or re-lands) outside every dir the caller is about
    * to consume. Marker creation is atomic — readers see the old gen or the
    * new one, never a torn value. */
  private def bumpFence(spark: SparkSession): Long = {
    val g = fenceGen(spark) + 1
    val f = fs(spark)
    f.mkdirs(new Path(path))
    f.create(new Path(path, s"__fence=$g"), false).close()
    g
  }

  /** Assign a (micro-)batch to cells and append it under `epoch`. With
    * `topCentroids` set, assignment rides the two-tier quantizer — the full
    * centroid set is shuffle-joined by top cell, never broadcast, so nlist
    * can grow ~sqrt(corpus) past broadcast size. */
  def append(batch: DataFrame, idCol: String, vecCol: String, epoch: Long = 0L): Unit = {
    val assigned = topCentroids match {
      case Some(top) =>
        SimilarityOps.assignToCentroidsTiered(batch, centroids, top, idCol, vecCol)
      case None => SimilarityOps.assignToCentroids(batch, centroids, idCol, vecCol)
    }
    // With PQ configured, each row also stores its code array — encoded in
    // the same single aggregation that carries the vector and cell (no
    // join-back), so the ADC search path never has to touch the vectors.
    val stored = pq match {
      case Some(c) => SimilarityOps.pqEncodeArray(assigned, c.codebook, idCol, vecCol,
        c.m, c.subDim, keep = Seq("centroid_id"))
      case None => assigned
    }
    stored
      .withColumn("__b", lit(epoch))
      .write.mode(SaveMode.Append).partitionBy("__b", "centroid_id").parquet(path)
  }

  /** Idempotent per-epoch write: replaces any previous content of `epoch`
    * (a partial write from a failed attempt, or the complete output of a
    * replayed batch) instead of appending alongside it. Fenced against
    * concurrent maintenance — see the class doc. */
  def writeEpoch(batch: DataFrame, idCol: String, vecCol: String, epoch: Long): Unit = {
    require(epoch >= 0, s"writer epochs are non-negative batchIds, got $epoch")
    writeEpochFrom(batch, idCol, vecCol, epoch, fenceGen(batch.sparkSession))
  }

  /** [[writeEpoch]] with the fence read the writer STARTED from made
    * explicit (the spec uses it to replay the torn interleaving
    * deterministically). Post-commit fence re-check: while maintenance has
    * moved the generation since `startGen`, the just-written dir may be in
    * a consumed snapshot — retire it and re-land under the current
    * generation. The loop terminates when a write commits with the fence
    * unmoved; each iteration re-executes `batch`'s plan, acceptable for the
    * rare write×maintenance race. */
  private[graft] def writeEpochFrom(batch: DataFrame, idCol: String, vecCol: String,
                                        epoch: Long, startGen: Long): Unit = {
    val f = fs(batch.sparkSession)
    var gen = startGen
    var committed = false
    while (!committed) {
      val dir = new Path(path, s"__b=${fencedEpoch(gen, epoch)}")
      if (f.exists(dir)) f.delete(dir, true)
      append(batch, idCol, vecCol, fencedEpoch(gen, epoch))
      val now = fenceGen(batch.sparkSession)
      if (now == gen) committed = true
      else { f.delete(dir, true); gen = now }
    }
  }

  /** Streaming sink maintaining the index. Exactly-once per batch: the
    * epoch directory is keyed by batchId and deleted before (re)writing
    * ([[writeEpoch]]), so a replay after a partial write or a pre-commit
    * restart replaces the previous attempt instead of appending duplicate
    * vectors. */
  def writer(stream: DataFrame, idCol: String, vecCol: String,
             checkpoint: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeEpoch(batch, idCol, vecCol, batchId)
      }

  /** ANN top-k over the indexed corpus. The probed cell ids (a bounded
    * #queries × nprobe driver list) become a static partition filter, so
    * the parquet scan plans with PartitionFilters = centroid_id IN (...) —
    * unread cells are never listed, opened, or scored. */
  def search(spark: SparkSession, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val probes = topCentroids match {
      case Some(top) =>
        SimilarityOps.probeCellsTiered(queries, centroids, top, idCol, vecCol, nprobe)
      case None => SimilarityOps.probeCells(queries, centroids, idCol, vecCol, nprobe)
    }
    val cells = probes.select(col("centroid_id")).distinct()
      .collect().map(_.get(0)) // metadata-sized: #queries × nprobe ids
    val corpus = spark.read.parquet(path)
      .filter(col("centroid_id").isin(cells.toIndexedSeq: _*))
      // duplicate-id guard (interrupted maintenance pass): the exchange is
      // over the PRUNED cells only, never the whole corpus
      .dropDuplicates(idCol)
    SimilarityOps.scoreProbedCells(corpus, probes, idCol, vecCol, k)
  }

  /** ADC top-k from the stored PQ codes alone (requires `pq`): the probed
    * cells become the same static partition filter as [[search]], but the
    * scan reads ONLY (id, codes, centroid_id) — column pruning never
    * touches the vector column, so at 100 TB a query reads nprobe/nlist of
    * the files AND ~1/40th of the bytes within them. */
  def searchAdc(spark: SparkSession, queries: DataFrame, idCol: String,
                vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val c = pq.getOrElse(throw new IllegalStateException("index has no PQ config"))
    val probes = topCentroids match {
      case Some(top) =>
        SimilarityOps.probeCellsTiered(queries, centroids, top, idCol, vecCol, nprobe)
      case None => SimilarityOps.probeCells(queries, centroids, idCol, vecCol, nprobe)
    }
    val cells = probes.select(col("centroid_id")).distinct()
      .collect().map(_.get(0))
    val codes = spark.read.parquet(path)
      .filter(col("centroid_id").isin(cells.toIndexedSeq: _*))
      .dropDuplicates(idCol)
      .select(col(idCol), col("centroid_id"),
        posexplode(col("codes")).as(Seq("sub", "code_id")))
    SimilarityOps.pqTopKProbed(codes, c.codebook, probes, idCol, k, c.m, c.subDim)
  }

  /** Per-cell small-file compaction: streaming appends accumulate one file
    * per batch per cell; this rewrites every current epoch into ONE new
    * maintenance epoch with ceil(cellBytes / targetFileBytes) files per cell
    * (same salted single-pass shape as KeyedParquetTable.compact), then
    * deletes the consumed epoch directories. Must not run concurrently with
    * the streaming writer (the writer would append to an epoch this pass has
    * already scanned). */
  def compactCells(spark: SparkSession, targetFileBytes: Long = 512L * 1024 * 1024): Unit = {
    // fence FIRST, then snapshot: every writer committing after the bump
    // re-lands outside the dirs this pass consumes and deletes
    bumpFence(spark)
    val dirs = epochDirs(spark)
    if (dirs.isEmpty) return
    val f = fs(spark)
    // per-cell byte totals from a driver-side METADATA listing (bounded by
    // #cells × #epochs, never rows)
    val cellBytes = dirs.flatMap { d =>
      f.listStatus(d).filter(s => s.isDirectory && s.getPath.getName.startsWith("centroid_id="))
        .map { c =>
          val bytes = f.listStatus(c.getPath)
            .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
            .map(_.getLen).sum
          (c.getPath.getName.stripPrefix("centroid_id="), bytes)
        }
    }.groupBy(_._1).map { case (cell, xs) =>
      (cell, math.max(1, math.ceil(xs.map(_._2).sum.toDouble / targetFileBytes).toInt))
    }.toSeq
    if (cellBytes.isEmpty) return
    val epoch = nextMaintenanceEpoch(spark)
    val planDf = spark.createDataFrame(cellBytes).toDF("__cell", "__n")
    // read EXACTLY the snapshot (basePath recovers the partition columns):
    // consume-what-you-delete, so a dir landing mid-pass is neither folded
    // in nor removed
    val all = spark.read.option("basePath", path)
      .parquet(dirs.map(_.toString): _*).drop("__b")
      .withColumn("__cell", col("centroid_id").cast("string"))
      .join(broadcast(planDf), Seq("__cell"))
    all
      .withColumn("__salt", pmod(xxhash64(col("__cell")), col("__n")))
      .repartition(col("centroid_id"), col("__salt"))
      .drop("__cell", "__n", "__salt")
      .withColumn("__b", lit(epoch))
      .write.mode(SaveMode.Append).partitionBy("__b", "centroid_id").parquet(path)
    IvfIndex.beforeConsumedDelete()
    dirs.foreach(d => f.delete(d, true))
  }

  /** Centroid drift: re-assign every stored vector against `newCentroids`
    * in one batch pass — the rebuilt table lands under a fresh maintenance
    * epoch, the consumed epochs are deleted, and the returned index serves
    * searches with the new centroid set. Same concurrency contract as
    * [[compactCells]]. */
  def reassign(spark: SparkSession, newCentroids: DataFrame,
               idCol: String, vecCol: String,
               newTopCentroids: Option[DataFrame] = None): IvfIndex = {
    bumpFence(spark)
    val dirs = epochDirs(spark)
    // the PQ codebook is frozen like the centroid set; re-appending through
    // `next` re-encodes (codes are a pure function of vector + codebook,
    // so re-encoding with the same codebook reproduces them)
    val next = new IvfIndex(path, newCentroids, newTopCentroids, pq)
    if (dirs.isEmpty) return next
    val epoch = nextMaintenanceEpoch(spark)
    val vectors = spark.read.option("basePath", path)
      .parquet(dirs.map(_.toString): _*).select(col(idCol), col(vecCol))
      .dropDuplicates(idCol)
    next.append(vectors, idCol, vecCol, epoch)
    val f = fs(spark)
    IvfIndex.beforeConsumedDelete()
    dirs.foreach(d => f.delete(d, true))
    next
  }

  /** Observability: cell id → parquet file count (driver-side metadata
    * listing; the compaction-cadence gate reads this). */
  def cellFileCounts(spark: SparkSession): Map[String, Int] = {
    val f = fs(spark)
    epochDirs(spark).flatMap { d =>
      f.listStatus(d).filter(s => s.isDirectory && s.getPath.getName.startsWith("centroid_id="))
        .map { c =>
          (c.getPath.getName.stripPrefix("centroid_id="),
            f.listStatus(c.getPath).count(s => s.isFile && s.getPath.getName.endsWith(".parquet")))
        }
    }.groupBy(_._1).map { case (cell, xs) => (cell, xs.map(_._2).sum) }
  }
}

object IvfIndex {
  /** Product-quantization shape for an index that stores code arrays
    * alongside (or, at scale, instead of) the raw vectors: the per-subspace
    * codebook relation (broadcast-small) and the (m, subDim) split it was
    * built with. */
  case class PqConfig(codebook: DataFrame, m: Int, subDim: Int)

  /** Writer-epoch namespace width per fence generation (gen · 2^40 +
    * batchId): a stream would need a trillion micro-batches to collide. */
  private[graft] val FenceStride: Long = 1L << 40

  /** Test seam: runs after a maintenance pass commits its rewrite, before
    * it deletes the consumed epoch dirs — the window the fence protects.
    * No-op in production. */
  private[graft] var beforeConsumedDelete: () => Unit = () => ()
}
