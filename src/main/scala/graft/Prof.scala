package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, TextOps}

/** Temporary micro-profiler for the round-7 sf2.6 flags (c1, d6b) — not part
  * of the library surface. Interleaves shots of the flagged queries (and a
  * cache-vs-materialize A/B of c1's signature relation) across scale factors,
  * logging load1 before each shot so ambient-spike-polluted readings are
  * identifiable; the per-variant MIN across shots is the plan-cost estimator
  * (methodology: docs/PLANS.md round-7 sweep section).
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDirs = if (args.nonEmpty) args.toSeq
      else Seq("/tmp/graft-testdata/sf1", "/tmp/graft-testdata/sf2.6")
    val shots = sys.env.getOrElse("SPARK_GRAFT_SHOTS", "5").toInt
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

    // c1 variant: signature relation MATERIALIZED as parquet (d2b shape)
    // instead of .cache() — the round-7 open question for c1 at 26x
    def c1Materialized(s: SparkSession, dir: String): DataFrame = {
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val sigs = DedupOps.materializeSignatures(d, "doc_id", "text",
        "/tmp/prof_c1_sigs", 16)
      val dupIds = DedupOps.pairsFromSignatures(sigs, 16, 4)
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

    for (dir <- sfDirs) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      println(s"== $dir: ${docs.count()} docs ==")
      // one-time: which per-row text op dominates the kept scan?
      for ((nm, c) <- Seq(
        "tokenCount" -> TextOps.tokenCount(col("text")),
        "quality" -> TextOps.qualityScore(col("text")),
        "langid" -> TextOps.langIdHeuristic(col("text")),
        "fingerprint" -> TextOps.fingerprint(col("text")))) {
        val t = timed(docs.select(c.as("x")).agg(count(col("x"))).collect())
        println(f"  textop $nm%-12s ${t}%6.2f s  load1=${osBean.getSystemLoadAverage}%.1f")
      }
      val variants: Seq[(String, () => Unit)] = Seq(
        "c1_cache" -> (() => {
          SparkEntry.queries("c1_corpus_clean")(spark, dir).count(); ()
        }),
        "c1_mat" -> (() => { c1Materialized(spark, dir).count(); () }),
        "d6b" -> (() => {
          SparkEntry.queries("d6b_clusters_alternating")(spark, dir).count()
          println(s"    (d6b rounds: ${DedupOps.lastCcRounds})")
        }))
      val mins = collection.mutable.Map[String, Double]().withDefaultValue(1e9)
      for (shot <- 1 to shots; (nm, f) <- variants) {
        val load = osBean.getSystemLoadAverage
        val t = timed { f(); spark.catalog.clearCache() }
        mins(nm) = math.min(mins(nm), t)
        println(f"  $nm%-10s shot $shot: ${t}%6.2f s  load1(before)=$load%.1f")
      }
      println(s"  MIN: " + variants.map { case (nm, _) =>
        f"$nm=${mins(nm)}%.2f" }.mkString("  "))
    }
    spark.stop()
  }
}
