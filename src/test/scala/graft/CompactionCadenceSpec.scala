package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, SimilarityOps}
import graft.streaming.{IvfIndex, StreamNearDup}

/** Long-replay compaction cadence: both streaming accumulators (the IVF
  * index's epoch dirs and the near-dup pipeline's signature table) grow one
  * epoch directory + >=1 file per micro-batch. Over 100+ batches that is an
  * unbounded small-file pile unless the compaction paths are actually driven
  * on a cadence — these specs replay >=100 batches with compaction
  * interleaved and assert (a) bounded epoch-dir/file counts throughout and
  * (b) query results identical to the uncompacted batch computation.
  */
class CompactionCadenceSpec extends SparkSpec {
  import spark.implicits._

  private def epochDirCount(path: String): Int = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) 0
    else fs.listStatus(root).count(s => s.isDirectory && s.getPath.getName.startsWith("__b="))
  }

  test("IVF index: 110-epoch replay with cadence compaction keeps dirs and files bounded") {
    val dim = 4
    def vec(i: Long): Array[Float] =
      Array.tabulate(dim)(d => (((i * 31 + d * 17) % 19).toFloat - 9f) / 9f)
    val centroids = (0 until 4)
      .map(c => (c.toLong, Array.tabulate(dim)(d => if (d == c) 1f else 0f)))
      .toDF("centroid_id", "centroid_vec")
    val path = tmpDir("ivf-cadence")
    val index = new IvfIndex(path, centroids)

    val epochs = 110
    val cadence = 25
    val perBatch = 3
    var maxDirs = 0
    for (e <- 0 until epochs) {
      val batch = (0 until perBatch).map(j => (e.toLong * perBatch + j, vec(e.toLong * perBatch + j)))
        .toDF("vec_id", "embedding")
      // same code path as the streaming writer's foreachBatch
      index.writeEpoch(batch, "vec_id", "embedding", e.toLong)
      maxDirs = math.max(maxDirs, epochDirCount(path))
      if (e % cadence == cadence - 1) {
        index.compactCells(spark, targetFileBytes = Long.MaxValue)
        assert(epochDirCount(path) === 1,
          "compaction must collapse all epochs into one maintenance epoch")
      }
    }
    // ceiling: never more than one cadence window of epochs + 1 compacted
    assert(maxDirs <= cadence + 1, s"epoch dirs hit $maxDirs > ${cadence + 1}")
    assert(epochDirCount(path) <= cadence + 1)
    // file count per cell is bounded by the dir count (1 file per cell/epoch
    // at this tiny batch size), NOT by the number of batches
    val files = index.cellFileCounts(spark)
    assert(files.values.max <= cadence + 1, s"cell file counts unbounded: $files")

    // correctness through 4 interleaved compactions: search == batch IVF
    val all = (0 until epochs * perBatch).map(i => (i.toLong, vec(i.toLong)))
      .toDF("vec_id", "embedding")
    val queries = all.filter(col("vec_id") < 3)
    val streamed = index.search(spark, queries, "vec_id", "embedding", k = 5, nprobe = 2)
    val batchRef = SimilarityOps.ivfTopK(
      SimilarityOps.assignToCentroids(all, centroids, "vec_id", "embedding"),
      centroids, queries, "vec_id", "embedding", k = 5, nprobe = 2)
    assert(streamed.count() === batchRef.count())
    assert(streamed.except(batchRef).isEmpty && batchRef.except(streamed).isEmpty)
  }

  test("near-dup: 100-micro-batch replay with cadence compaction equals batch LSH") {
    // sf0.01 documents over 100 single-file triggers = 100 micro-batches;
    // the signature table compacts every 10 batches
    val dir = "/root/testdata/sf0.01"
    val docs = Tables.documents(spark, dir)
    assert(docs.count() >= 100, "need enough docs for 100 non-empty fixtures")
    val work = tmpDir("neardup-cadence")
    val streamed = StreamNearDup.run(spark, docs, work,
      numFiles = 100, maxFilesPerTrigger = 1, compactEvery = 10)

    // compaction must not change WHAT is emitted: exact multiplicity match
    // with the single-shot batch recomputation
    val batch = DedupOps.lshCandidatePairs(docs, "doc_id", "text", 16, 4)
    assert(batch.count() > 0)
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)

    // bounded state: at most one cadence window of sig epochs + 1 compacted
    assert(epochDirCount(s"$work/sigs") <= 11,
      s"signature epoch dirs unbounded: ${epochDirCount(s"$work/sigs")}")
    // and the replay really was 100 micro-batches (one per fixture file)
    val dataDir = new Path(s"$work/data")
    val fs = dataDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(dataDir).count(_.isFile) === 100)
  }
}
