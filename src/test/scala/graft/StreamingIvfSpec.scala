package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.SimilarityOps
import graft.streaming.IvfIndex

/** Streaming ANN index: vectors streamed in micro-batches land in a
  * cell-partitioned table; search equals the batch IVF result and the scan
  * is statically partition-pruned to the probed cells. */
class StreamingIvfSpec extends SparkSpec {
  import spark.implicits._

  test("streamed index equals batch IVF; search scan is partition-pruned") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = emb.filter(col("vec_id") % 40 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid_vec"))
    val index = new IvfIndex(tmpDir("ivf"), centroids)

    // stream the corpus in two micro-batches
    val rows = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val (first, second) = rows.splitAt(rows.length / 2)
    val input = MemoryStream[(Long, Array[Float])](spark)
    val q = index.writer(input.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", tmpDir("ivf-ckpt")).start()
    try {
      input.addData(first.toIndexedSeq); q.processAllAvailable()
      input.addData(second.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    val queries = emb.filter(col("vec_id") < 3)
    val streamed = index.search(spark, queries, "vec_id", "embedding", k = 5, nprobe = 2)

    // batch reference: same centroids, same corpus, same params
    val assigned = SimilarityOps.assignToCentroids(emb, centroids, "vec_id", "embedding")
    val batch = SimilarityOps.ivfTopK(assigned, centroids, queries,
      "vec_id", "embedding", k = 5, nprobe = 2)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)

    // the probed-cell filter must reach the scan as a partition filter
    val plan = streamed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [centroid_id"),
      s"expected static partition pruning in:\n$plan")

    // replay a batch (restart before checkpoint commit): the epoch dir is
    // rewritten, not appended — no duplicate vectors, search unchanged
    index.writeEpoch(second.toIndexedSeq.toDF("vec_id", "embedding"),
      "vec_id", "embedding", epoch = 1L)
    val replayed = index.search(spark, queries, "vec_id", "embedding", k = 5, nprobe = 2)
    assert(replayed.except(batch).isEmpty && batch.except(replayed).isEmpty)

    // compaction: total file count drops to one per cell, search equality holds
    val before = index.cellFileCounts(spark)
    assert(before.values.sum > before.size, "expected multi-file cells pre-compact")
    index.compactCells(spark, targetFileBytes = Long.MaxValue)
    val after = index.cellFileCounts(spark)
    assert(after.values.forall(_ == 1), s"expected 1 file/cell, got $after")
    val compacted = index.search(spark, queries, "vec_id", "embedding", k = 5, nprobe = 2)
    assert(compacted.except(batch).isEmpty && batch.except(compacted).isEmpty)

    // centroid re-assignment: new centroid set, rebuilt index equals batch
    // IVF computed against the same new centroids
    val newCentroids = emb.filter(col("vec_id") % 40 === 20)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid_vec"))
    val reindexed = index.reassign(spark, newCentroids, "vec_id", "embedding")
    val reSearch = reindexed.search(spark, queries, "vec_id", "embedding", k = 5, nprobe = 2)
    val reAssigned = SimilarityOps.assignToCentroids(emb, newCentroids, "vec_id", "embedding")
    val reBatch = SimilarityOps.ivfTopK(reAssigned, newCentroids, queries,
      "vec_id", "embedding", k = 5, nprobe = 2)
    assert(reSearch.except(reBatch).isEmpty && reBatch.except(reSearch).isEmpty)
  }

  test("two-tier quantizer: exact at probeTop=nlist1, structurally valid at probeTop=2") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = emb.filter(col("vec_id") % 40 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid_vec"))
    // top level: every 8th centroid — a SUBSET by id, per the
    // groupCentroidsByTop contract
    val top = emb.filter(col("vec_id") % 320 === 0)
      .select(col("vec_id").as("top_id"), col("embedding").as("top_vec"))
    val nlist1 = top.count().toInt
    assert(nlist1 > 1, "need at least two top cells for the test to mean anything")

    val flat = SimilarityOps.assignToCentroids(emb, centroids, "vec_id", "embedding")
      .select(col("vec_id"), col("centroid_id"))

    // probeTop = nlist1 probes every top cell: the candidate set is every
    // centroid, so the result must be IDENTICAL to the flat assign —
    // structural equality, not luck.
    val full = SimilarityOps.assignToCentroidsTiered(emb, centroids, top,
        "vec_id", "embedding", probeTop = nlist1)
      .select(col("vec_id"), col("centroid_id"))
    assert(full.except(flat).isEmpty && flat.except(full).isEmpty,
      "probeTop=all tiered assign must equal the flat assign exactly")

    // the production setting (probeTop=2): the RESULT may legitimately
    // differ from flat (candidate pruning is approximate on unclustered
    // data — the s2b oracle pins its exact semantics), but two structural
    // invariants must hold regardless of data: no vector is ever dropped,
    // and every assignment lands inside the vector's probed top cells.
    val tiered = SimilarityOps.assignToCentroidsTiered(emb, centroids, top,
        "vec_id", "embedding", probeTop = 2)
      .select(col("vec_id"), col("centroid_id"))
    assert(tiered.count() === flat.count(), "tiered assign must never drop a vector")
    val routedPairs = SimilarityOps.probeCellsTiered(emb, centroids, top,
        "vec_id", "embedding", nprobe = centroids.count().toInt, probeTop = 2)
      .select(col("query_id").as("vec_id"), col("centroid_id"))
    assert(tiered.join(routedPairs, Seq("vec_id", "centroid_id"), "left_anti").isEmpty,
      "an assignment escaped the vector's probed top cells")

    // probe side: tiered query probe at probeTop=all equals the flat probe
    val queries = emb.filter(col("vec_id") < 3)
    val flatProbe = SimilarityOps.probeCells(queries, centroids,
        "vec_id", "embedding", nprobe = 2)
      .select(col("query_id"), col("centroid_id"))
    val tieredProbe = SimilarityOps.probeCellsTiered(queries, centroids, top,
        "vec_id", "embedding", nprobe = 2, probeTop = nlist1)
      .select(col("query_id"), col("centroid_id"))
    assert(tieredProbe.except(flatProbe).isEmpty && flatProbe.except(tieredProbe).isEmpty,
      "probeTop=all tiered probe must equal the flat probe exactly")

    // e2e: a tiered-quantizer INDEX serves exactly what the tiered BATCH
    // plan computes — on-disk layout and partition-pruned search introduce
    // no divergence from the in-memory form
    val index = new IvfIndex(tmpDir("ivf-tiered"), centroids, Some(top))
    index.writeEpoch(emb, "vec_id", "embedding", epoch = 0L)
    val searched = index.search(spark, queries, "vec_id", "embedding", k = 5, nprobe = 2)
    val batch = SimilarityOps.ivfTopKTiered(
      SimilarityOps.assignToCentroidsTiered(emb, centroids, top, "vec_id", "embedding"),
      centroids, top, queries, "vec_id", "embedding", k = 5, nprobe = 2)
    assert(searched.except(batch).isEmpty && batch.except(searched).isEmpty)
  }

  test("PQ index: stored-code ADC search equals the in-memory IVF-PQ plan " +
      "across compaction and reassign") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = emb.filter(col("vec_id") % 40 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid_vec"))
    val cb = SimilarityOps.pqCodebook(emb.filter(col("vec_id") % 40 === 0),
      "vec_id", "embedding", m = 8, subDim = 8)
    val index = new IvfIndex(tmpDir("ivf-pq"), centroids,
      pq = Some(IvfIndex.PqConfig(cb, m = 8, subDim = 8)))
    index.writeEpoch(emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", 0L)
    index.writeEpoch(emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", 1L)

    // in-memory reference: same assignment, long-form encode, probed ADC
    val queries = emb.filter(col("vec_id") < 3)
    val assigned = SimilarityOps.assignToCentroids(emb, centroids, "vec_id", "embedding")
    val codes = SimilarityOps.pqEncode(assigned, cb, "vec_id", "embedding",
      m = 8, subDim = 8, carry = Seq("centroid_id"))
    val probes = SimilarityOps.probeCells(queries, centroids, "vec_id", "embedding", 2)
    val batch = SimilarityOps.pqTopKProbed(codes, cb, probes, "vec_id", 5, m = 8, subDim = 8)

    val fromDisk = index.searchAdc(spark, queries, "vec_id", "embedding", k = 5, nprobe = 2)
    assert(fromDisk.except(batch).isEmpty && batch.except(fromDisk).isEmpty,
      "stored-code ADC diverged from the in-memory plan")

    // maintenance must not change a neighbor: compaction rewrites files,
    // reassign re-encodes against the same frozen codebook
    index.compactCells(spark, targetFileBytes = Long.MaxValue)
    val afterCompact = index.searchAdc(spark, queries, "vec_id", "embedding", 5, 2)
    assert(afterCompact.except(batch).isEmpty && batch.except(afterCompact).isEmpty)
    val re = index.reassign(spark, centroids, "vec_id", "embedding")
    val afterReassign = re.searchAdc(spark, queries, "vec_id", "embedding", 5, 2)
    assert(afterReassign.except(batch).isEmpty && batch.except(afterReassign).isEmpty)
  }

  test("epoch fence: a writer replaying a consumed epoch mid-compaction loses no vectors") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = emb.filter(col("vec_id") % 40 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid_vec"))
    val index = new IvfIndex(tmpDir("ivf-fence"), centroids)

    // batch 0 committed; batch 1's FIRST attempt wrote only half its rows
    // (torn write — the stream will replay batchId 1)
    val batch0 = emb.filter(col("vec_id") % 2 === 0)
    val batch1 = emb.filter(col("vec_id") % 2 === 1)
    val batch1Partial = batch1.filter(col("vec_id") % 4 === 1)
    index.writeEpoch(batch0, "vec_id", "embedding", epoch = 0L)
    index.writeEpoch(batch1Partial, "vec_id", "embedding", epoch = 1L)

    // the replay of batch 1 lands INSIDE compaction's commit→delete window,
    // carrying the fence generation it read BEFORE compaction bumped it —
    // the exact interleaving that silently lost (batch1 \ partial) before
    // fencing: compaction consumed the partial attempt, then deleted the
    // full rewrite along with its snapshot.
    IvfIndex.beforeConsumedDelete = () =>
      index.writeEpochFrom(batch1, "vec_id", "embedding", epoch = 1L, startGen = 0L)
    try index.compactCells(spark, targetFileBytes = Long.MaxValue)
    finally IvfIndex.beforeConsumedDelete = () => ()

    // every vector of both batches present exactly once after the id guard
    val stored = spark.read.parquet(index.path).select(col("vec_id")).dropDuplicates("vec_id")
    val expected = batch0.select(col("vec_id")).union(batch1.select(col("vec_id")))
    assert(stored.except(expected).isEmpty && expected.except(stored).isEmpty,
      "fence failed: vectors lost or invented across the write x compact race")

    // the re-landed epoch lives in the new generation's namespace, above
    // every epoch the compaction pass consumed
    assert(index.fenceGen(spark) === 1L)
    val search = index.search(spark, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 5, nprobe = 2)
    assert(search.count() > 0)

    // a second compaction folds the duplicate rows of the partial batch
    // into one epoch; the id set is unchanged
    index.compactCells(spark, targetFileBytes = Long.MaxValue)
    val after = spark.read.parquet(index.path).select(col("vec_id")).dropDuplicates("vec_id")
    assert(after.except(expected).isEmpty && expected.except(after).isEmpty)
    assert(index.fenceGen(spark) === 2L)
  }
}
