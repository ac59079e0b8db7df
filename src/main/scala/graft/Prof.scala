package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, TextOps}

/** Temporary micro-profiler — not part of the library surface. Current
  * target: why does the bucket-cap guard cost c1 ~5x at sf1? Interleaves
  * capped vs uncapped builds of the c1 composition in one JVM, plus a
  * stage-by-stage split of the capped path. Min across shots = plan cost
  * (methodology: docs/PLANS.md round-7 sweep section).
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft-testdata/sf1"
    val shots = sys.env.getOrElse("SPARK_GRAFT_SHOTS", "3").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    def c1(cap: Int): DataFrame = {
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val sigs = DedupOps.signatures(d, "doc_id", "text", 16).cache()
      val dupIds = DedupOps.pairsFromSignatures(sigs, 16, 4, cap)
        .filter(col("est_jaccard") >= 0.5)
        .select(col("id_b").as("doc_id")).distinct()
      val kept = d.select(col("doc_id"),
        TextOps.langIdHeuristic(col("text")).as("lang"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        TextOps.qualityScore(col("text")).as("quality"),
        TextOps.fingerprint(col("text")).as("fp"))
        .filter(col("n_tokens") >= 5 && col("quality") >= 0.5)
        .cache()
      val canon = kept.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      kept.join(canon, Seq("fp", "doc_id"))
        .join(dupIds, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          graft.ops.Exact.fmt(col("quality"), 4).as("quality_r"))
    }

    // stage split of the capped path, one pass
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val sigs0 = DedupOps.signatures(d, "doc_id", "text", 16).cache()
    println(f"sig cache fill: ${timed(sigs0.count())}%.2f s")
    println(f"banded count agg (narrow): ${timed {
      DedupOps.bandedSignatures(sigs0, 16, 4).select(col("band"), col("band_sig"))
        .groupBy(col("band"), col("band_sig")).agg(count(lit(1)).as("n"))
        .filter(col("n") > DedupOps.DefaultBucketCap).count()
    }}%.2f s")
    println(f"pairs uncapped from cache: ${timed {
      DedupOps.pairsFromSignatures(sigs0, 16, 4).filter(col("est_jaccard") >= 0.5)
        .select(col("id_b")).distinct().count()
    }}%.2f s")
    println(f"pairs capped from cache: ${timed {
      DedupOps.pairsFromSignatures(sigs0, 16, 4, DedupOps.DefaultBucketCap)
        .filter(col("est_jaccard") >= 0.5)
        .select(col("id_b")).distinct().count()
    }}%.2f s")
    spark.catalog.clearCache()

    val variants: Seq[(String, () => Unit)] = Seq(
      "c1_capped" -> (() => { c1(DedupOps.DefaultBucketCap).count(); () }),
      "c1_uncapped" -> (() => { c1(Int.MaxValue).count(); () }))
    val mins = collection.mutable.Map[String, Double]().withDefaultValue(1e9)
    for (shot <- 1 to shots; (nm, f) <- variants) {
      val load = osBean.getSystemLoadAverage
      val t = timed { f(); spark.catalog.clearCache() }
      mins(nm) = math.min(mins(nm), t)
      println(f"$nm%-12s shot $shot: ${t}%6.2f s  load1(before)=$load%.1f")
    }
    println("MIN: " + variants.map { case (nm, _) => f"$nm=${mins(nm)}%.2f" }.mkString("  "))
    spark.stop()
  }
}
