package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.DedupOps

// temporary micro-profiler — not part of the library surface
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("warm docs scan")(docs.agg(count(lit(1))).collect())
    t("sig16 x3gram count")(DedupOps.signatures(docs, "doc_id", "text", 16).agg(count(lit(1))).collect())
    t("sig16 again")(DedupOps.signatures(docs, "doc_id", "text", 16).agg(count(lit(1))).collect())
    t("shingles only")(docs.select(array_distinct(DedupOps.shingles(col("text"), 3)).as("sh"))
      .agg(sum(size(col("sh")))).collect())
    t("md5 over shingles")(docs.select(
        transform(array_distinct(DedupOps.shingles(col("text"), 3)), x => DedupOps.baseHash(x)).as("h"))
      .agg(sum(size(col("h")))).collect())
    import graft.ops.TextOps
    val kept0 = docs.select(col("doc_id"),
      TextOps.langIdHeuristic(col("text")).as("lang"),
      TextOps.tokenCount(col("text")).as("n_tokens"),
      TextOps.qualityScore(col("text")).as("quality"),
      TextOps.fingerprint(col("text")).as("fp"))
      .filter(col("n_tokens") >= 5 && col("quality") >= 0.5)
    t("c1 kept scan only")(kept0.agg(count(lit(1))).collect())
    t("c1 kept cached")({ val k = kept0.cache(); k.agg(count(lit(1))).collect();
      val canon = k.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      k.join(canon, Seq("fp", "doc_id")).agg(count(lit(1))).collect(); k.unpersist() })
    t("c1 full")(SparkEntry.queries("c1_corpus_clean")(spark, sfDir).agg(count(lit(1))).collect())
    spark.catalog.clearCache()
    t("c1 full again")(SparkEntry.queries("c1_corpus_clean")(spark, sfDir).agg(count(lit(1))).collect())
    spark.catalog.clearCache()
    val sigs = DedupOps.signatures(docs, "doc_id", "text", 16).localCheckpoint()
    t("pairs from ckpt sigs")(DedupOps.pairsFromSignatures(sigs, 16, 4)
      .filter(col("est_jaccard") >= 0.5).agg(count(lit(1))).collect())
    t("cc label-prop")(DedupOps.connectedComponents(
      DedupOps.pairsFromSignatures(sigs, 16, 4).filter(col("est_jaccard") >= 0.5))
      .agg(count(lit(1))).collect())
    t("cc alternating")(DedupOps.connectedComponentsAlternating(
      DedupOps.pairsFromSignatures(sigs, 16, 4).filter(col("est_jaccard") >= 0.5))
      .agg(count(lit(1))).collect())
    spark.stop()
  }
}
