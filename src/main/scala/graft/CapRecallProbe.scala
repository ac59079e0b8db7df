package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ops.DedupOps

/** Round-13 evidence harness for the LSH bucket-cap recall trade (VERDICT
  * r12 item 3): `d19_cap_recall` pins the audit SEMANTICS at gate scale on a
  * synthesized degenerate corpus; this probe measures the same audit on the
  * FULL corpus at sf0.1 / ScaleGen-10× — bucket sizes taken over the whole
  * banded relation (where real over-cap buckets live), candidate pairs
  * subset-filtered (valid because banding is per-doc: candidates-on-subset
  * ≡ subset-filtered candidates, the d10 identity), truth exact
  * shingle-Jaccard on the bounded subset (a doc_id slice plus a clone block
  * of `nClones` verbatim copies of doc 0 so at least one bucket family is
  * over-cap by construction at every sweep point).
  *
  * Output: one JSON line per cap — recall/precision vs exact truth, the
  * over-cap bucket census (how many buckets, how many banded rows dropped),
  * and the candidate-generation wall time. Signatures are materialized ONCE
  * to a temp parquet table and re-banded per cap (the d2b compute-once
  * shape), so the sweep varies only the guard.
  *
  * Usage: runMain graft.CapRecallProbe [sfDir] [sliceBound] [nClones]
  */
object CapRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sliceBound = args.lift(1).map(_.toLong).getOrElse(2000L)
    val nClones = args.lift(2).map(_.toLong).getOrElse(800L)
    val caps = Seq(100, 400, 1600)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    val cloneBase = 1000000000L
    val d0 = Tables.documents(spark, sfDir)
    val clones = spark.range(1, nClones + 1)
      .crossJoin(broadcast(d0.filter(col("doc_id") === 0).select(col("text"))))
      .select((col("id") + cloneBase).as("doc_id"), col("text"))
    val corpus = d0.select(col("doc_id"), col("text")).unionByName(clones)

    val tmp = java.nio.file.Files.createTempDirectory("caprecall").toString
    val sig = DedupOps.materializeSignatures(corpus, "doc_id", "text", s"$tmp/sig")

    def inSubset(c: org.apache.spark.sql.Column) =
      c < sliceBound || c >= cloneBase

    // exact truth on the bounded subset (DISK_ONLY: reused across caps, and
    // deserialized cache blocks compete with execution memory in this heap)
    val sub = corpus.filter(inSubset(col("doc_id")))
    val tok = sub.select(col("doc_id"),
      explode(array_distinct(DedupOps.shingles(col("text"), 3))).as("t"))
    val sizes = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("ns"))
    val truth = tok.select(col("t"), col("doc_id").as("id_a"))
      .join(tok.select(col("t"), col("doc_id").as("id_b")), "t")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("ni"))
      .join(sizes.select(col("doc_id").as("id_a"), col("ns").as("na")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("ns").as("nb")), "id_b")
      .filter(col("ni") * 2 >= col("na") + col("nb") - col("ni"))
      .select(col("id_a"), col("id_b"))
      .persist(StorageLevel.DISK_ONLY)
    val nTrue = truth.count()
    val nDocs = corpus.count()

    val banded = DedupOps.bandedSignatures(sig, 16, 4)
      .persist(StorageLevel.DISK_ONLY)
    banded.count()

    for (cap <- caps) {
      val census = banded.groupBy(col("band"), col("band_sig"))
        .agg(count(lit(1)).as("c")).filter(col("c") > cap)
        .agg(coalesce(count(lit(1)), lit(0L)).as("buckets"),
          coalesce(sum(col("c")), lit(0L)).as("rows"))
        .collect()(0)
      val t0 = System.nanoTime()
      val cand = DedupOps.pairsFromSignatures(sig, 16, 4, cap)
        .filter(inSubset(col("id_a")) && inSubset(col("id_b")))
        .select(col("id_a"), col("id_b"))
        .persist(StorageLevel.DISK_ONLY)
      val nCand = cand.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val nHits = truth.join(cand, Seq("id_a", "id_b"), "left_semi").count()
      cand.unpersist()
      val recallBp = if (nTrue == 0) -1 else nHits * 10000 / nTrue
      val precBp = if (nCand == 0) -1 else nHits * 10000 / nCand
      println(f"""{"metric":"cap_recall","sf_dir":"$sfDir","n_docs":$nDocs,"slice":$sliceBound,"clones":$nClones,"cap":$cap,"n_true":$nTrue,"n_cand":$nCand,"n_hits":$nHits,"recall_bp":$recallBp,"precision_bp":$precBp,"overcap_buckets":${census.getLong(0)},"overcap_rows":${census.getLong(1)},"cand_sec":$secs%.2f}""")
    }
    spark.stop()
  }
}
